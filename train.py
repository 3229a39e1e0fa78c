#!/usr/bin/env python
"""Training CLI (reference train.py parity). See saro_gs_tpu/cli.py."""
import os
import sys

if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from saro_gs_tpu.cli import train_main
    train_main()
    os._exit(0)  # skip slow axon plugin teardown
