#!/usr/bin/env python3
"""Root training entry point — same flags/defaults as the reference
``train.py`` (see ``mlx_vae_tpu/cli/train.py``)."""

from mlx_vae_tpu.cli.train import main

if __name__ == "__main__":
    main()
