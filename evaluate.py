#!/usr/bin/env python
"""Root eval entry point (repo-family convention; SURVEY.md §2.4).

Equivalent to `python -m mmtraj.cli eval ...`.
"""
import sys

from mmtraj.cli import main

if __name__ == "__main__":
    sys.exit(main(["eval"] + sys.argv[1:]))
