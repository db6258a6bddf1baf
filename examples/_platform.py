"""Shared example bootstrap: honour JAX_PLATFORMS=cpu even where a
sitecustomize force-registers a TPU plugin at interpreter boot (it
overrides the env var; jax.config still wins if no backend has
initialized yet — same workaround as __graft_entry__.dryrun_multichip).

Import this BEFORE anything that initializes a JAX backend.
"""

import os

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import jax

    if jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")
