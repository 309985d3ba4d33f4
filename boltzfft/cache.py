"""Persistence: compilation cache and precompute serialization.

The reference's only persisted artifact is the FFTW wisdom file — a plan cache
imported/exported around plan creation (``FFTWBoltzmannOperator.cpp:60-68``,
``setWisdomFileName`` at ``FFTWBoltzmannOperator.hpp:39-41``).  The XLA-native
equivalents:

* ``enable_compilation_cache(path)``: turns on JAX's persistent compilation
  cache so jitted collision programs (20-40 s first compile on TPU) reload
  from disk across processes — wisdom, but for XLA executables.
* ``save_precomp``/``load_precomp``: serialize the quadrature/weight pytree so
  large setups (high-order designs, big beta2 tables) skip recomputation.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .weights import CollisionConfig, Precomp


def enable_compilation_cache(path: str | Path = "~/.cache/boltzfft-xla") -> str:
    """Enable JAX's persistent compilation cache at ``path`` (wisdom-file analog)."""
    path = str(Path(path).expanduser())
    Path(path).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path


def save_precomp(path: str | Path, cfg: CollisionConfig, pre: Precomp) -> None:
    """Serialize (config, precomp) to an .npz archive."""
    arrays = {
        f"arr_{name}": np.asarray(v)
        for name, v in pre._asdict().items()
        if v is not None
    }
    np.savez_compressed(
        path, __config__=json.dumps(dataclasses.asdict(cfg)), **arrays
    )


def load_precomp(path: str | Path) -> tuple[CollisionConfig, Precomp]:
    """Load (config, precomp); arrays are placed with the config's dtypes."""
    with np.load(path, allow_pickle=False) as z:
        data = json.loads(str(z["__config__"]))
        # Archives written before the antipodal-pair reduction existed were
        # built from the full design; defaulting the missing key to False
        # keeps cfg.ns_eff consistent with the stored node tables (the new
        # default True would silently mis-group the radial hoisting).
        data.setdefault("antipodal", False)
        cfg = CollisionConfig(**data)
        fields = {}
        for name in Precomp._fields:
            key = f"arr_{name}"
            fields[name] = jnp.asarray(z[key]) if key in z.files else None
    return cfg, Precomp(**fields)
