#!/usr/bin/env python3
"""CLI shim mirroring the reference entry point:

    python main_linprobe.py --model vit_base_patch16 --cls_features ep ...

(reference: main_linprobe.py:760-777; auto-resume glob handled inside the
driver). The implementation lives in ep_tpu/cli/linprobe.py.
"""
from ep_tpu.cli.linprobe import cli

if __name__ == "__main__":
    cli()
