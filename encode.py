#!/usr/bin/env python3
"""Root encode entry point (see ``mlx_vae_tpu/cli/encode.py``)."""

from mlx_vae_tpu.cli.encode import main

if __name__ == "__main__":
    main()
