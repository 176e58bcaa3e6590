"""Dataset geometry/stability analysis: .rsmol (or EDM npz) -> JSON report.

Clean-room counterpart of molecule/analyse_geom.py (analyse_geom_stability,
compute_n_nodes_dict, create_histograms): distance-inferred bond orders,
atom/molecule stability fractions, node-count dict, atom-type distribution,
and per-bond-type length histograms, using the same featurizers the eval
metrics use (reed_tpu.eval.{molecule_metrics,midi_metrics}).

Usage:
  python -m tools.analyze_molecules --data /data/geom/train.rsmol \
      [--dataset geom] [--limit 10000] [--out stats.json]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser("analyze_molecules")
    ap.add_argument("--data", required=True)
    ap.add_argument("--dataset", choices=["qm9", "geom"], default="qm9")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from reed_tpu.data.molecule import build_vocab, load_dataset
    from reed_tpu.eval.midi_metrics import dataset_statistics
    from reed_tpu.eval.molecule_metrics import (GEOM_ATOM_DECODER,
                                                QM9_ATOM_DECODER,
                                                check_stability)

    vocab = build_vocab()
    mols = load_dataset(args.data)
    if args.limit:
        mols = mols[:args.limit]
    decoder = (GEOM_ATOM_DECODER if args.dataset == "geom"
               else QM9_ATOM_DECODER)

    n_mol_stable = n_atoms_stable = n_atoms = 0
    for m in mols:
        # .rsmol atomics use the full vocab (PAD/MASK offset 2); fold into
        # the decoder index space via element symbols
        symbols = vocab.decode(m.atomics)
        try:
            types = [decoder.index(s) for s in symbols]
        except ValueError:
            continue  # element outside the decoder
        ok, ns, na = check_stability(m.coords, types, decoder, args.dataset)
        n_mol_stable += int(ok)
        n_atoms_stable += ns
        n_atoms += na

    stats = dataset_statistics(mols, num_atom_types=len(vocab))
    report = {
        "num_molecules": len(mols),
        "mol_stable": n_mol_stable / max(1, len(mols)),
        "atom_stable": n_atoms_stable / max(1, n_atoms),
        "n_nodes": {int(k): int(v) for k, v in
                    sorted(stats["node_counts"].items())},
        "atom_types": {vocab.tokens[i]: int(c)
                       for i, c in enumerate(stats["atom_types"]) if c > 0},
        "bond_type_counts": [int(c) for c in stats["bond_types"]],
        "bond_length_mean_by_type": {
            int(t): (round(float(np.average(list(c.keys()),
                                            weights=list(c.values()))), 3)
                     if c else None)
            for t, c in stats["bond_lengths"].items()},
    }
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()
