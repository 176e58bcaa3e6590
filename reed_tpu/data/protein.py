"""Protein data pipeline: PDB cluster splits, chain loading with AF3
embeddings, and fixed-bucket token-budget batching.

Clean-room rebuild of protein/fmif/utils.py:13-460 (build_training_clusters,
PDB_dataset, loader_pdb, StructureDataset, StructureLoader, get_pdbs) and
featurize (protein/fmif/model_utils.py:17-165) — with one deliberate
TPU-first change: the reference's greedy token-budget batching emits
arbitrary padded lengths (an XLA recompile storm); here lengths snap to a
fixed bucket ladder (SURVEY.md §7.4 item 1) so each bucket compiles once.
Losses are mask-normalized so padding is free.
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

ALPHABET = "ACDEFGHIKLMNPQRSTVWYX"
ALPHABET_WITH_MASK = ALPHABET + "Z"
TOKEN_INDEX = {c: i for i, c in enumerate(ALPHABET_WITH_MASK)}

DEFAULT_BUCKETS = (64, 128, 192, 256)


@dataclass
class PDBParams:
    data_dir: str                     # contains pdb/<mid>/<pdbid>*.pt
    list_csv: str = "list.csv"
    val_ids: str = "valid_clusters.txt"
    test_ids: str = "test_clusters.txt"
    repr_dir: Optional[str] = None    # AF3 embeddings per cluster
    rescut: float = 3.5
    datcut: str = "2030-01-01"
    max_len: int = 10_000


def build_training_clusters(params: PDBParams, debug: bool = False):
    """CSV -> {cluster_id: [(chain_id, hash), ...]} per split
    (reference: protein/fmif/utils.py:362-409)."""
    from datetime import date

    def parse_date(s):
        return date.fromisoformat(s[:10])

    val_ids = set(int(l) for l in open(
        os.path.join(params.data_dir, params.val_ids)))
    test_ids = set(int(l) for l in open(
        os.path.join(params.data_dir, params.test_ids)))
    if debug:
        val_ids, test_ids = set(), set()

    datcut = parse_date(params.datcut)
    with open(os.path.join(params.data_dir, params.list_csv)) as f:
        reader = csv.reader(f)
        next(reader)
        rows = [[r[0], r[3], int(r[4])] for r in reader
                if float(r[2]) <= params.rescut
                and parse_date(r[1]) <= datcut
                and len(r[-1]) <= params.max_len]
    if debug:
        rows = rows[:20]

    train, valid, test = {}, {}, {}
    for chain_id, h, cluster in rows:
        target = (valid if cluster in val_ids
                  else test if cluster in test_ids else train)
        target.setdefault(cluster, []).append((chain_id, h))
    if debug:
        valid = test = train
    return train, valid, test


def load_chain(params: PDBParams, chain_id: str, cluster_id) -> Optional[Dict]:
    """Load one chain's backbone + sequence (+ AF3 embeddings)
    (reference: loader_pdb, protein/fmif/utils.py:262-320). Uses torch.load
    for the reference's .pt layout; returns numpy."""
    import torch

    pdbid, chid = chain_id.split("_")
    prefix = os.path.join(params.data_dir, "pdb", pdbid[1:3], pdbid)
    if not os.path.isfile(prefix + ".pt"):
        return None
    chain = torch.load(f"{prefix}_{chid}.pt", map_location="cpu",
                       weights_only=False)
    seq = chain["seq"]
    l = len(seq)
    out = {
        "seq": seq,
        "xyz": np.asarray(chain["xyz"], np.float32)[:, :4],  # N,Ca,C,O
        "name": chain_id,
    }
    if params.repr_dir is not None:
        reprs = np.load(os.path.join(
            params.repr_dir, f"cluster_{cluster_id}",
            "seed-0_embeddings", "embeddings.npz"))
        out["repr_single"] = reprs["single_embeddings"][:l].astype(np.float32)
        out["repr_pair"] = reprs["pair_embeddings"][:l, :l].astype(np.float32)
        out["repr_structure"] = reprs["structure_embeddings"][:l].astype(
            np.float32)
    return out


def sample_cluster_chains(rng: np.random.Generator, clusters: Dict,
                          params: PDBParams, max_length: int = 256,
                          limit: Optional[int] = None) -> List[Dict]:
    """One epoch's structures: the first chain of each cluster, filtered by
    alphabet and length (reference: PDB_dataset sel_idx=0 + get_pdbs +
    StructureDataset filters)."""
    alphabet_set = set(ALPHABET)
    out = []
    ids = list(clusters)
    rng.shuffle(ids)
    for cid in ids:
        chain_id, _ = clusters[cid][0]
        entry = load_chain(params, chain_id, cid)
        if entry is None or not isinstance(entry["seq"], str):
            continue
        if set(entry["seq"]) - alphabet_set:
            continue
        if len(entry["seq"]) > max_length:
            continue
        out.append(entry)
        if limit is not None and len(out) >= limit:
            break
    return out


def bucket_for_length(length: int,
                      buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


def featurize(entries: List[Dict], bucket_len: int,
              repr_dims: Optional[Dict[str, int]] = None) -> Dict[str, np.ndarray]:
    """Pad a list of chains to [B, bucket_len, ...] tensors matching the
    trainer schema (reference: featurize, model_utils.py:17-165)."""
    b = len(entries)
    l = bucket_len
    x = np.zeros((b, l, 4, 3), np.float32)
    s = np.full((b, l), TOKEN_INDEX["X"], np.int32)
    mask = np.zeros((b, l), np.float32)
    chain_m = np.ones((b, l), np.float32)
    residue_idx = np.full((b, l), -100, np.int32)
    chain_enc = np.zeros((b, l), np.int32)
    batch = {}
    if repr_dims:
        batch["repr_single"] = np.zeros((b, l, repr_dims["single"]), np.float32)
        batch["repr_pair"] = np.zeros((b, l, l, repr_dims["pair"]), np.float32)
        batch["repr_structure"] = np.zeros((b, l, repr_dims["structure"]),
                                           np.float32)
    for i, e in enumerate(entries):
        n = min(len(e["seq"]), l)
        xyz = np.nan_to_num(np.asarray(e["xyz"], np.float32)[:n])
        x[i, :n] = xyz
        s[i, :n] = [TOKEN_INDEX[c] for c in e["seq"][:n]]
        valid = np.isfinite(np.asarray(e["xyz"], np.float32)[:n]).all((1, 2))
        mask[i, :n] = valid.astype(np.float32)
        residue_idx[i, :n] = np.arange(n)
        if repr_dims and "repr_single" in e:
            batch["repr_single"][i, :n] = e["repr_single"][:n]
            batch["repr_pair"][i, :n, :n] = e["repr_pair"][:n, :n]
            batch["repr_structure"][i, :n] = e["repr_structure"][:n]
    batch.update(X=x, S=s, mask=mask, chain_M=chain_m,
                 residue_idx=residue_idx, chain_encoding_all=chain_enc)
    return batch


def token_bucket_batches(entries: List[Dict], token_budget: int = 20_000,
                         buckets: Sequence[int] = DEFAULT_BUCKETS,
                         repr_dims: Optional[Dict[str, int]] = None,
                         shuffle_rng: Optional[np.random.Generator] = None,
                         ) -> Iterator[Dict[str, np.ndarray]]:
    """Group structures into fixed-shape batches: bucket by padded length,
    batch size = token_budget // bucket_len. Replaces StructureLoader's
    greedy variable-shape batching (protein/fmif/utils.py:56-88)."""
    by_bucket: Dict[int, List[Dict]] = {}
    for e in entries:
        by_bucket.setdefault(bucket_for_length(len(e["seq"]), buckets),
                             []).append(e)
    batches = []
    for bucket_len, items in by_bucket.items():
        bs = max(1, token_budget // bucket_len)
        for i in range(0, len(items), bs):
            chunk = items[i:i + bs]
            while len(chunk) < bs:  # pad batch with repeats for fixed shapes
                chunk = chunk + chunk[: bs - len(chunk)]
            batches.append((bucket_len, chunk))
    if shuffle_rng is not None:
        shuffle_rng.shuffle(batches)
    for bucket_len, chunk in batches:
        yield featurize(chunk, bucket_len, repr_dims)


def synthetic_entries(rng: np.random.Generator, n: int = 16,
                      min_len: int = 20, max_len: int = 256,
                      repr_dims: Optional[Dict[str, int]] = None
                      ) -> List[Dict]:
    """Random chains with the loader schema (for tests / smoke runs)."""
    out = []
    for _ in range(n):
        l = int(rng.integers(min_len, max_len + 1))
        seq = "".join(rng.choice(list(ALPHABET[:20]), size=l))
        steps = rng.standard_normal((l, 3)).astype(np.float32) * 1.5
        ca = np.cumsum(steps, 0) + np.arange(l)[:, None] * [3.8, 0, 0]
        offsets = np.array([[-1.46, 0, 0], [0, 0, 0], [1.52, 0, 0],
                            [2.4, 1.0, 0]], np.float32)
        entry = {"seq": seq, "xyz": ca[:, None, :] + offsets[None],
                 "name": f"synth_{l}"}
        if repr_dims:
            entry["repr_single"] = rng.standard_normal(
                (l, repr_dims["single"])).astype(np.float32)
            entry["repr_pair"] = rng.standard_normal(
                (l, l, repr_dims["pair"])).astype(np.float32)
            entry["repr_structure"] = rng.standard_normal(
                (l, repr_dims["structure"])).astype(np.float32)
        out.append(entry)
    return out
