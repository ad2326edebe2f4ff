#!/usr/bin/env python3
"""Root interpolation entry point (see ``mlx_vae_tpu/cli/interpolate.py``)."""

from mlx_vae_tpu.cli.interpolate import main

if __name__ == "__main__":
    main()
