"""Shared example bootstrap: repo-root import path + optional CPU backend.

`--cpu` forces the virtual-device CPU backend (useful off-TPU); the axon
sitecustomize pins jax_platforms programmatically, so the env var alone is
not enough — the config update below is required.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")
