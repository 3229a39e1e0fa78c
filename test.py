#!/usr/bin/env python
"""Evaluation CLI (reference test.py parity). See saro_gs_tpu/cli.py."""
import os
import sys

if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from saro_gs_tpu.cli import test_main
    test_main()
    os._exit(0)
