#!/usr/bin/env python3
"""Root serving entry point (see ``mlx_vae_tpu/cli/serve.py``)."""

from mlx_vae_tpu.cli.serve import main

if __name__ == "__main__":
    main()
