"""DISTS folder CLI (reference surface: scripts/metrics/calculate_dists.py).
Thin wrapper over calculate_lpips_dists.py with --metric dists."""
import sys

from calculate_lpips_dists import main  # noqa: E402

if __name__ == "__main__":
    sys.argv.insert(1, "--metric")
    sys.argv.insert(2, "dists")
    main()
