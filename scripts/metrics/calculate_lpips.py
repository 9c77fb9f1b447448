"""LPIPS folder CLI (reference surface: scripts/metrics/calculate_lpips.py).
Thin wrapper over calculate_lpips_dists.py with --metric lpips."""
import sys

from calculate_lpips_dists import main  # noqa: E402

if __name__ == "__main__":
    sys.argv.insert(1, "--metric")
    sys.argv.insert(2, "lpips")
    main()
