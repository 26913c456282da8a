#!/usr/bin/env python
"""Root train entry point (repo-family convention; SURVEY.md §2.4).

Equivalent to `python -m mmtraj.cli train ...`.
"""
import sys

from mmtraj.cli import main

if __name__ == "__main__":
    sys.exit(main(["train"] + sys.argv[1:]))
