#!/usr/bin/env python3
"""Root generation entry point (see ``mlx_vae_tpu/cli/generate.py``)."""

from mlx_vae_tpu.cli.generate import main

if __name__ == "__main__":
    main()
