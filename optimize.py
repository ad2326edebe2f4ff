#!/usr/bin/env python3
"""Root latent-optimization entry point (see ``mlx_vae_tpu/cli/optimize.py``)."""

from mlx_vae_tpu.cli.optimize import main

if __name__ == "__main__":
    main()
