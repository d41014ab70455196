#!/usr/bin/env python3
"""Repo-root entry point with the reference CLI surface
(``python3 main.py --mode {train,inference} ...`` — /root/reference/main.py).
Thin shim over tecogan_tpu.cli.main."""

from tecogan_tpu.cli.main import main

if __name__ == "__main__":
    main()
