"""Testing/eval pipeline CLI (reference surface: basicsr/test.py).

Usage:  python -m ssl_tpu.test -opt options/test/ESRGANSSL/test_x4.yml
"""

from __future__ import annotations

import logging
import os
import time

from ssl_tpu.data import build_dataloader, build_dataset
from ssl_tpu.models import build_model
from ssl_tpu.utils.logger import get_env_info, get_root_logger
from ssl_tpu.utils.options import dict2str, parse_options


def test_pipeline(root_path: str, args=None):
    opt, parsed = parse_options(root_path, is_train=False, args=args)
    if getattr(parsed, "launcher", "none") == "jax":
        import jax
        jax.distributed.initialize()

    os.makedirs(opt["path"]["results_root"], exist_ok=True)
    log_file = os.path.join(opt["path"]["log"], f"test_{opt['name']}_{int(time.time())}.log")
    logger = get_root_logger(log_level=logging.INFO, log_file=log_file)
    logger.info(get_env_info())
    logger.info(dict2str(opt))

    test_loaders = []
    for _, dataset_opt in sorted(opt["datasets"].items()):
        test_set = build_dataset(dataset_opt)
        test_loaders.append(build_dataloader(test_set, dataset_opt))
        logger.info(f"Number of test images in {dataset_opt['name']}: {len(test_set)}")

    model = build_model(opt)
    state = model.init_state(lq_shape=(1, 32, 32, 3))

    results = {}
    for test_loader in test_loaders:
        test_set_name = test_loader.dataset.opt["name"]
        logger.info(f"Testing {test_set_name}...")
        metrics = model.validation(state, test_loader, current_iter=opt["name"],
                                   tb_logger=None,
                                   save_img=(opt.get("val") or {}).get("save_img", True))
        logger.info(f"Results [{test_set_name}]: {metrics}")
        results[test_set_name] = metrics
    return results


def main():
    """Console-script entry (`ssl-test -opt ...`)."""
    test_pipeline(os.getcwd())


if __name__ == "__main__":
    main()
