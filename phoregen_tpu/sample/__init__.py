from .sampler import Sampler, GuidanceOpt
from .decode import decode_batch
from .reconstruct import (reconstruct_from_generated_with_edges,
                          mol_is_connected, MolReconsError)
from .chem import HAVE_RDKIT, HAVE_OPENBABEL, SimpleMol, mol_to_smiles
from .writers import write_sdf, append_sdf, write_xyz, write_smiles
