"""Command-line entry point.

Mirrors the reference CLI surface (`main.py:387-404`):

    python -m rcf_tpu.cli <config.yaml> [--test]
        [--test-override-pretrained PATH]
        [--test-override-object-channel N]
        [--no-test] [--print-config]
        [--opts KEY VALUE ...]
"""

from __future__ import annotations

import argparse
import sys

import yaml

from rcf_tpu.config import load_config
from rcf_tpu.utils import get_logger, set_loglevel

logger = get_logger()


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="RCF-TPU: unsupervised video segmentation")
    parser.add_argument("config", type=str, nargs="?", default="configs/rcf/rcf_stage1.yaml",
                        help="path to YAML config")
    parser.add_argument("--test", action="store_true", help="evaluation only")
    parser.add_argument("--test-override-pretrained", type=str, default=None,
                        help="override pretrained checkpoint at test time")
    parser.add_argument("--test-override-object-channel", type=int, default=None,
                        help="override object channel at test time")
    parser.add_argument("--no-test", action="store_true",
                        help="skip the final test after training")
    parser.add_argument("--print-config", action="store_true",
                        help="print the resolved config and exit")
    parser.add_argument("--opts", nargs=argparse.REMAINDER, default=[],
                        help="dotted KEY VALUE config overrides")
    return parser.parse_args(argv)


def main(argv=None) -> int:
    cli = parse_args(argv)
    set_loglevel(debug=True)

    import os as _os

    from .utils.platform import apply_platform_env

    apply_platform_env()

    # Multi-host (DCN) initialization — the TPU-native counterpart of the
    # reference's `torch.distributed.run` launcher (README.md:75,
    # main.py:455). Explicit env wiring (RCF_COORDINATOR etc.) or automatic
    # TPU-pod detection via RCF_DIST=1. Must run before first JAX use.
    if _os.environ.get("RCF_COORDINATOR") or _os.environ.get("RCF_DIST"):
        import jax

        kwargs = {}
        if _os.environ.get("RCF_COORDINATOR"):
            kwargs = dict(
                coordinator_address=_os.environ["RCF_COORDINATOR"],
                num_processes=int(_os.environ["RCF_NUM_PROCESSES"]),
                process_id=int(_os.environ["RCF_PROCESS_ID"]),
            )
            if _os.environ.get("RCF_LOCAL_DEVICE_IDS"):
                kwargs["local_device_ids"] = [
                    int(x) for x in _os.environ["RCF_LOCAL_DEVICE_IDS"].split(",")]
        jax.distributed.initialize(**kwargs)
        logger.info(
            f"jax.distributed initialized: process {jax.process_index()}"
            f"/{jax.process_count()}, {jax.local_device_count()} local device(s)")
    logger.info(f"Loading config from {cli.config}")
    cfg = load_config(cli.config, opts=cli.opts)

    if cli.test:
        if cli.test_override_pretrained is not None:
            import os

            cfg.pretrained_model = cli.test_override_pretrained
            cfg.checkpoints_dir = os.path.dirname(cli.test_override_pretrained)
        if cli.test_override_object_channel is not None:
            cfg.object_channel = cli.test_override_object_channel

    if cli.print_config:
        yaml.safe_dump(cfg.to_dict(), sys.stdout, sort_keys=False)
        return 0

    from rcf_tpu.train.loop import run

    run(cfg, test_only=cli.test, no_test=cli.no_test)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
