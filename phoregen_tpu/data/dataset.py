"""Dataset factory: filelist-driven (mol, phore) pairs with per-item cache.

Parity target: `get_dataset` + `mol_dataset`
(reference `utils/training_utils.py:106-160`, `datasets/phoregen.py:155-417`):
- zinc_300: three filelists (train/valid/test), each row one (mol, phore)
  pair; pdbbind: one index pickle with `pdbbind_{train,valid,test}` keys;
- per-item pickle cache keyed by name in `dataset.save_path`
  (reference `datasets/phoregen.py:391-415`);
- molecules over `max_atom` heavy atoms are filtered out.

Filelist format here: a pickle or JSON list of [mol_path, phore_path] pairs
(the reference uses pickled lists of pair tuples). Falls back to the
synthetic corpus when no filelists are configured or RDKit is absent.
"""
from __future__ import annotations

import json
import os
import pickle
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..config import Config
from .loader import RawSample
from .phore import featurize_phore, parse_phore_file
from .synthetic import synthetic_dataset


def _load_pairs(filelist: str) -> List[Tuple[str, str]]:
    if filelist.endswith(".json"):
        with open(filelist) as f:
            return [tuple(x) for x in json.load(f)]
    with open(filelist, "rb") as f:
        return [tuple(x) for x in pickle.load(f)]


def build_pair_sample(mol_path: str, phore_path: str, cfg: Config
                      ) -> RawSample:
    """Parse + featurize one (mol, phore) pair; centered on the phore COM
    (reference `datasets/phoregen.py:342-353`)."""
    from .mol import featurize_mol, load_mol

    ds = cfg.dataset
    mol = load_mol(mol_path)
    lig_type, lig_pos, bidx, battr = featurize_mol(mol,
                                                   remove_h=ds.remove_H)
    if len(lig_type) > ds.max_atom:
        raise ValueError(f"{mol_path}: {len(lig_type)} atoms > "
                         f"max_atom {ds.max_atom}")
    phore = parse_phore_file(phore_path)
    px, ppos, pnorm, center = featurize_phore(phore, ds.data_name,
                                              norm_mode="new")
    return RawSample(
        lig_type=lig_type, lig_pos=(lig_pos - center).astype(np.float32),
        bond_index=bidx, bond_attr=battr, phore_x=px,
        phore_pos=(ppos - center).astype(np.float32), phore_norm=pnorm,
        center=center,
        name=os.path.splitext(os.path.basename(mol_path))[0])


class PairDataset:
    """Lazy, per-item-cached list of RawSamples from a filelist."""

    def __init__(self, pairs: Sequence[Tuple[str, str]], cfg: Config):
        self.pairs = list(pairs)
        self.cfg = cfg
        self.cache_dir = cfg.dataset.save_path or ""
        if self.cache_dir:
            os.makedirs(self.cache_dir, exist_ok=True)

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i: int) -> RawSample:
        mol_path, phore_path = self.pairs[i]
        key = os.path.splitext(os.path.basename(mol_path))[0]
        cache = os.path.join(self.cache_dir, key + ".pkl") \
            if self.cache_dir else ""
        if cache and os.path.exists(cache):
            with open(cache, "rb") as f:
                return pickle.load(f)
        sample = build_pair_sample(mol_path, phore_path, self.cfg)
        if cache:
            with open(cache, "wb") as f:
                pickle.dump(sample, f)
        return sample

    def materialize(self) -> List[RawSample]:
        out = []
        for i in range(len(self)):
            try:
                out.append(self[i])
            except Exception as e:  # skip unparseable items, like the
                print(f"[W] skipping pair {self.pairs[i]}: {e}")  # reference
        return out


def pz_dataset(dataset_file: str, cfg: Config) -> List[RawSample]:
    """Legacy pre-built-graph path (reference `datasets/phoregen.py:24-152`
    `pz_dataset`): a single pickle holding a list of ready RawSamples (or
    dicts with RawSample fields), filtered by `max_atom`."""
    with open(dataset_file, "rb") as f:
        items = pickle.load(f)
    out = []
    for it in items:
        s = it if isinstance(it, RawSample) else RawSample(**it)
        if s.n_atoms <= cfg.dataset.max_atom:
            out.append(s)
    return out


def get_dataset(cfg: Config, synthetic_size: int = 0
                ) -> Tuple[List[RawSample], List[RawSample],
                           List[RawSample]]:
    """(train, valid, test) RawSample lists."""
    ds = cfg.dataset

    def _hermetic(seed: int, n: int):
        if ds.corpus == "mixed":
            from .realcorpus import mixed_corpus
            return mixed_corpus(seed, n, ds.data_name,
                                max_phore=ds.max_phore,
                                max_atoms=min(ds.max_atom,
                                              max(ds.ligand_buckets)),
                                real_frac=ds.real_frac)
        return synthetic_dataset(seed, n, ds.data_name, max_atoms=syn_max)

    syn_max = min(ds.max_atom, max(ds.ligand_buckets))
    if synthetic_size:
        n = synthetic_size
        return (_hermetic(0, n), _hermetic(1, max(n // 10, 8)),
                _hermetic(2, max(n // 10, 8)))

    if ds.data_name == "zinc_300" and ds.zinc_train_filelist:
        sets = []
        for fl in (ds.zinc_train_filelist, ds.zinc_valid_filelist,
                   ds.zinc_test_filelist):
            sets.append(PairDataset(_load_pairs(fl), cfg).materialize()
                        if fl else [])
        return tuple(sets)

    if ds.data_name == "pdbbind" and ds.pdbbind_filelist:
        with open(ds.pdbbind_filelist, "rb") as f:
            index = pickle.load(f)
        sets = []
        for split in ("train", "valid", "test"):
            pairs = index.get(f"pdbbind_{split}", [])
            sets.append(PairDataset(pairs, cfg).materialize())
        return tuple(sets)

    # fallback: hermetic corpus (RDKit-less environments, smoke tests)
    print("[W] no dataset filelists configured; using hermetic "
          f"'{ds.corpus}' pairs")
    return (_hermetic(0, 256), _hermetic(1, 32), _hermetic(2, 32))
