#!/usr/bin/env python3
"""CLI shim mirroring the reference's main_attention_stats.py entry point."""
from ep_tpu.cli.attention_stats import cli

if __name__ == "__main__":
    cli()
