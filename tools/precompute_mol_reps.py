"""Precompute frozen-encoder molecule reps: .rsmol dataset -> reps.npy.

The reference runs the frozen UniMol/Frad encoder per training batch
(molecule/semlaflow/train.py:300-330, molecule/src/self_condition_train_*);
here reps are computed once and the trainers read reps.npy next to the
dataset (reed_tpu.cli --data-dir convention). Weights come from a one-time
torch->npz conversion (encoders/{unimol,torchmd_et}.py converters).

Usage:
  python -m tools.precompute_mol_reps --data /data/geom/train.rsmol \
      --weights unimol_global.npz --encoder unimol --out /data/geom/reps.npy
  (add --element-table to map dataset vocab ids to atomic numbers for frad)
"""

from __future__ import annotations

import argparse
import os

import numpy as np


# atomic numbers for the default 18-token vocabulary (PAD, MASK, then atoms)
VOCAB_ATOMIC_NUMBERS = {
    "H": 1, "C": 6, "N": 7, "O": 8, "F": 9, "P": 15, "S": 16, "Cl": 17,
    "Br": 35, "B": 5, "Al": 13, "Si": 14, "As": 33, "I": 53, "Hg": 80,
    "Bi": 83,
}


def _unimol_from_params(params):
    """Infer the UniMolGlobal architecture from a converted param tree."""
    from reed_tpu.encoders.unimol import UniMolGlobal

    p = params["params"] if "params" in params else params
    emb = p["embed_tokens"]["embedding"]
    layers = sum(1 for k in p if k.startswith("layers_"))
    heads = p["gbf_proj_fc2"]["kernel"].shape[1]
    ffn = p["layers_0"]["fc1"]["kernel"].shape[1] \
        if "fc1" in p.get("layers_0", {}) else 2048
    rep_dim = p["global_head_fc2"]["kernel"].shape[1]
    return UniMolGlobal(vocab_size=emb.shape[0], embed_dim=emb.shape[1],
                        ffn_dim=ffn, heads=heads, layers=layers,
                        gaussian_k=p["gbf_proj_fc1"]["kernel"].shape[1],
                        rep_dim=rep_dim), rep_dim


def encode_unimol(mols, params, batch_size: int, rep_dim: int):
    import jax

    from reed_tpu.encoders.unimol import format_input_to_unimol

    model, rep_dim = _unimol_from_params(params)
    fwd = jax.jit(lambda p, t, d, e: model.apply(p, t, d, e))
    max_n = max(m.seq_length for m in mols)
    out = np.zeros((len(mols), rep_dim), np.float32)
    for i in range(0, len(mols), batch_size):
        chunk = mols[i:i + batch_size]
        b = len(chunk)
        types = np.zeros((b, max_n), np.int32)
        coords = np.zeros((b, max_n, 3), np.float32)
        mask = np.zeros((b, max_n), np.float32)
        for j, m in enumerate(chunk):
            n = m.seq_length
            types[j, :n] = m.atomics - 2  # strip PAD/MASK offset
            coords[j, :n] = m.coords
            mask[j, :n] = 1.0
        tokens, dist, edge = format_input_to_unimol(types, coords, mask)
        out[i:i + b] = np.asarray(jax.device_get(
            fwd(params, tokens, dist, edge)))
        print(f"\r{i + b}/{len(mols)}", end="", flush=True)
    print()
    return out


def encode_frad(mols, params, batch_size: int, vocab_tokens):
    import jax

    from reed_tpu.encoders.torchmd_et import FradEncoder

    model = FradEncoder()
    fwd = jax.jit(lambda p, z, pos, m: model.apply(p, z, pos, m))
    max_n = max(m.seq_length for m in mols)
    first = None
    outs = []
    for i in range(0, len(mols), batch_size):
        chunk = mols[i:i + batch_size]
        b = len(chunk)
        z = np.zeros((b, max_n), np.int32)
        pos = np.zeros((b, max_n, 3), np.float32)
        mask = np.zeros((b, max_n), np.float32)
        for j, m in enumerate(chunk):
            n = m.seq_length
            z[j, :n] = [VOCAB_ATOMIC_NUMBERS.get(vocab_tokens[int(t)], 6)
                        for t in m.atomics]
            pos[j, :n] = m.coords
            mask[j, :n] = 1.0
        rep = np.asarray(jax.device_get(fwd(params, z, pos, mask)))
        outs.append(rep)
        print(f"\r{i + b}/{len(mols)}", end="", flush=True)
    print()
    return np.concatenate(outs)


def main(argv=None):
    ap = argparse.ArgumentParser("precompute_mol_reps")
    ap.add_argument("--data", required=True, help=".rsmol dataset")
    ap.add_argument("--weights", required=True, help="converted npz params")
    ap.add_argument("--encoder", choices=["unimol", "frad"],
                    default="unimol")
    ap.add_argument("--out", default=None,
                    help="default: reps.npy next to --data")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--rep-dim", type=int, default=512)
    args = ap.parse_args(argv)

    from reed_tpu.data.molecule import build_vocab, load_dataset
    from reed_tpu.eval.fid import load_params_npz

    mols = load_dataset(args.data)
    params = load_params_npz(args.weights)
    print(f"{len(mols)} molecules, encoder={args.encoder}")
    if args.encoder == "unimol":
        reps = encode_unimol(mols, params, args.batch_size, args.rep_dim)
    else:
        reps = encode_frad(mols, params, args.batch_size,
                           build_vocab().tokens)
    out = args.out or os.path.join(os.path.dirname(os.path.abspath(
        args.data)), "reps.npy")
    np.save(out, reps)
    sizes = np.array([m.seq_length for m in mols], np.int64)
    np.save(os.path.join(os.path.dirname(out), "sizes.npy"), sizes)
    print(f"wrote {out} {reps.shape} + sizes.npy")


if __name__ == "__main__":
    main()
