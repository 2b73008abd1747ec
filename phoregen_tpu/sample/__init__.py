"""Sampling/generation subpackage.

Lazy re-exports (PEP 562): the reconstruction stack (reconstruct/chem/
writers) is jax-free so spawned reconstruction worker processes
(`GenerationPipeline(recon_workers=...)`) can import it without
initializing a JAX backend; the sampler/decode imports pull in jax and are
resolved only on first attribute access.
"""
from .reconstruct import (reconstruct_from_generated_with_edges,
                          mol_is_connected, MolReconsError)
from .chem import HAVE_RDKIT, HAVE_OPENBABEL, SimpleMol, mol_to_smiles
from .writers import write_sdf, append_sdf, write_xyz, write_smiles

_LAZY = {
    "Sampler": "sampler", "GuidanceOpt": "sampler",
    "decode_batch": "decode", "GenerationPipeline": "pipeline",
}

__all__ = ["reconstruct_from_generated_with_edges", "mol_is_connected",
           "MolReconsError", "HAVE_RDKIT", "HAVE_OPENBABEL", "SimpleMol",
           "mol_to_smiles", "write_sdf", "append_sdf", "write_xyz",
           "write_smiles"] + list(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib
        mod = importlib.import_module("." + _LAZY[name], __name__)
        return getattr(mod, name)
    raise AttributeError(name)
