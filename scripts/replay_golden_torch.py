"""Replay the golden parity pack against the ACTUAL reference PhoreGen code.

VERDICT round-2 item 7 asked for golden vectors "so a torch-enabled
environment can replay them against the reference one-for-one later". This
image ships CPU torch (but not compiled PyG), so the replay runs NOW using
pure-torch shims for the PyG ops (tests/pyg_shims.py): the reference's own
`models/diffusion.py` / `models/uni_denoiser.py` / `models/transition.py`
execute unmodified on the pack's inputs and weights, and their outputs are
compared against this framework's recorded outputs.

Usage:
    python scripts/replay_golden_torch.py \
        [--reference /root/reference] [--pack tests/fixtures/golden/golden_pack.npz] \
        [--out PARITY_TORCH_r03.json]

Exit code 0 iff every comparison is within tolerance.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np


def flat_inputs(pack):
    """Unpad the packed batch into reference-style flat PyG tensors."""
    import torch

    lig_mask = pack["in/lig_mask"].astype(bool)        # [B, NL]
    phore_mask = pack["in/phore_mask"].astype(bool)    # [B, NP]
    B, NL = lig_mask.shape

    h_node, pos, batch_node = [], [], []
    h_edge, edge_index, batch_edge = [], [], []
    h_phore, pos_phore, phore_norm, batch_phore = [], [], [], []
    lig_offset = 0
    grid_slots = []                                    # (g, src, dst) per edge
    for g in range(B):
        valid = np.flatnonzero(lig_mask[g])
        n = len(valid)
        h_node.append(pack["in/h_node"][g, valid])
        pos.append(pack["in/pos"][g, valid])
        batch_node += [g] * n
        # full directed off-diagonal edge set over valid atoms
        for a in range(n):
            for b in range(n):
                if a == b:
                    continue
                s, d = valid[a], valid[b]
                edge_index.append((lig_offset + a, lig_offset + b))
                h_edge.append(pack["in/h_edge"][g, s, d])
                batch_edge.append(g)
                grid_slots.append((g, s, d))
        lig_offset += n
        pv = np.flatnonzero(phore_mask[g])
        h_phore.append(pack["in/phore_x"][g, pv])
        pos_phore.append(pack["in/phore_pos"][g, pv])
        phore_norm.append(pack["in/phore_norm"][g, pv])
        batch_phore += [g] * len(pv)

    t = lambda a, dt=torch.float32: torch.tensor(np.asarray(a), dtype=dt)
    return dict(
        h_node_pert=t(np.concatenate(h_node)),
        pos_pert=t(np.concatenate(pos)),
        batch_node=t(batch_node, torch.long),
        h_edge_pert=t(np.stack(h_edge)),
        edge_index=t(np.asarray(edge_index).T, torch.long),
        batch_edge=t(batch_edge, torch.long),
        time_step=t(pack["in/t"], torch.long),
        h_phore=t(np.concatenate(h_phore)),
        pos_phore=t(np.concatenate(pos_phore)),
        phore_norm=t(np.concatenate(phore_norm)),
        batch_phore=t(batch_phore, torch.long),
    ), lig_mask, grid_slots


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--pack",
                    default=os.path.join(REPO, "tests", "fixtures", "golden",
                                         "golden_pack.npz"))
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "PARITY_TORCH_r03.json"))
    ap.add_argument("--rtol", type=float, default=2e-4)
    ap.add_argument("--atol", type=float, default=2e-4)
    args = ap.parse_args()

    import pyg_shims
    EasyDict = pyg_shims.install(args.reference)
    import torch

    torch.manual_seed(0)
    pack = np.load(args.pack)
    cfg = json.loads(bytes(pack["config_json"]))
    from models.diffusion import PhoreDiff  # the reference's own code

    model = PhoreDiff(EasyDict(cfg["model"]), "zinc_300")
    model.eval()
    state = {k[len("ref_state/"):]: torch.tensor(np.asarray(pack[k]))
             for k in pack.files if k.startswith("ref_state/")}
    missing, unexpected = model.load_state_dict(state, strict=False)
    bad_missing = [m for m in missing
                   if not (m.endswith(".offset") or ".betas" in m
                           or m.endswith(".freq_bands")
                           or "alphas" in m or "coef" in m or ".std" in m
                           or "q_mats" in m or "q_onestep" in m
                           or "transpopse" in m or "init_prob" in m
                           or "Lt_" in m)]
    report = {"missing_nonbuffer": bad_missing,
              "unexpected": list(unexpected), "checks": {}}
    assert not unexpected, f"unexpected keys: {unexpected[:8]}"
    assert not bad_missing, f"missing weights: {bad_missing[:8]}"

    inputs, lig_mask, grid_slots = flat_inputs(pack)
    with torch.no_grad():
        pred_v, pred_pos, pred_bond, (cnt_l, cnt_u) = model(**inputs)

    def check(name, ref_t, ours_np):
        ref = np.asarray(ref_t.detach())
        ours = np.asarray(ours_np)
        adiff = float(np.max(np.abs(ref - ours)))
        denom = np.maximum(np.abs(ref), np.abs(ours))
        rdiff = float(np.max(np.abs(ref - ours) / np.maximum(denom, 1e-3)))
        ok = bool(np.allclose(ref, ours, rtol=args.rtol, atol=args.atol))
        report["checks"][name] = {"max_abs": adiff, "max_rel": rdiff,
                                  "ok": ok, "n": int(ref.size)}
        print(f"  {name:<28} max_abs={adiff:.3e} max_rel={rdiff:.3e} "
              f"{'OK' if ok else 'MISMATCH'}")
        return ok

    print("[replay] forward outputs vs reference PhoreDiff.forward:")
    B, NL = lig_mask.shape
    ours_v = pack["out/pred_node"][lig_mask]
    ours_pos = pack["out/pred_pos"][lig_mask]
    ok = check("pred_node", pred_v, ours_v)
    ok &= check("pred_pos", pred_pos, ours_pos)
    ours_bond = np.stack([pack["out/pred_edge"][g, s, d]
                          for (g, s, d) in grid_slots])
    ok &= check("pred_bond", pred_bond, ours_bond)
    ok &= check("count_lower", cnt_l.reshape(-1),
                pack["out/count_lower"].reshape(-1))
    ok &= check("count_upper", cnt_u.reshape(-1),
                pack["out/count_upper"].reshape(-1))

    print("[replay] categorical posteriors vs GeneralCategoricalTransition:")
    v0n = pack["post/v0_prob_node"]                    # [B, NL, kn]
    vtn = pack["post/vt_node"]
    v0b = pack["post/v0_prob_bond"]
    vtb = pack["post/vt_bond"]
    kn = v0n.shape[-1]
    kb = v0b.shape[-1]
    eps = 1e-30
    Bn = v0n.shape[0] * v0n.shape[1]
    batch_n = torch.arange(v0n.shape[0]).repeat_interleave(v0n.shape[1])
    batch_b = torch.arange(v0b.shape[0]).repeat_interleave(
        v0b.shape[1] * v0b.shape[2])
    T = model.num_timesteps
    for tt in (1, T // 2, T - 1):
        tv = torch.full((v0n.shape[0],), tt, dtype=torch.long)
        log_v0n = torch.log(torch.tensor(v0n.reshape(Bn, kn)).clamp(min=eps))
        log_vtn = torch.log(torch.nn.functional.one_hot(
            torch.tensor(vtn.reshape(-1), dtype=torch.long), kn
        ).float().clamp(min=eps))
        ref_post_n = model.node_transition.q_v_posterior(
            log_v0n, log_vtn, tv, batch_n, v0_prob=True)
        ok &= check(f"log_post_node_t{tt}", ref_post_n,
                    pack[f"post/log_post_node_t{tt}"].reshape(Bn, kn))
        nb = v0b.shape[0] * v0b.shape[1] * v0b.shape[2]
        log_v0b = torch.log(torch.tensor(v0b.reshape(nb, kb)).clamp(min=eps))
        log_vtb = torch.log(torch.nn.functional.one_hot(
            torch.tensor(vtb.reshape(-1), dtype=torch.long), kb
        ).float().clamp(min=eps))
        ref_post_b = model.edge_transition.q_v_posterior(
            log_v0b, log_vtb, tv, batch_b, v0_prob=True)
        ok &= check(f"log_post_bond_t{tt}", ref_post_b,
                    pack[f"post/log_post_bond_t{tt}"].reshape(nb, kb))
        # Gaussian posterior coefficients (ContigousTransition buffers)
        gt = model.pos_transition
        ok &= check(f"gauss_coef_x0_t{tt}", gt.coef_x0[tt],
                    pack[f"post/gauss_coef_x0_t{tt}"])
        ok &= check(f"gauss_coef_xt_t{tt}", gt.coef_xt[tt],
                    pack[f"post/gauss_coef_xt_t{tt}"])
        ok &= check(f"gauss_std_t{tt}", gt.std[tt],
                    pack[f"post/gauss_std_t{tt}"])

    report["all_ok"] = bool(ok)
    report["reference"] = args.reference
    report["tolerances"] = {"rtol": args.rtol, "atol": args.atol}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[replay] {'ALL OK' if ok else 'MISMATCHES'} -> {args.out}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
