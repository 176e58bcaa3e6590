"""ChemNet (FCD feature extractor) in JAX + Frechet ChemNet Distance.

The reference computes FCD through `fcd_torch` (molsets.py:6,529-580),
which runs a pretrained SMILES LSTM ("ChemNet") and takes the Frechet
distance over its 512-d penultimate activations. The pretrained weight
file is env-gated in this zero-egress image, but the *code* is not: this
module owns the SMILES one-hot encoding (the published FCD charset), a
torch-layout stacked-LSTM forward (weights consumed exactly as torch
packs them — `weight_ih_l{k}` [4H,D] with (i,f,g,o) gate order — so a
downloaded ChemNet state dict converts without name surgery), and the
FCD statistic via eval/frechet.frechet_distance. Parity against torch
nn.LSTM is pinned in tests/test_chemnet.py.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# The published FCD SMILES charset (fcd / fcd_torch `get_one_hot`):
# multi-character tokens matched first, one UNK bucket, right-padded.
FCD_TOKENS = [
    "C", "N", "O", "H", "F", "Cl", "P", "B", "Br", "S", "I", "Si",
    "#", "(", ")", "+", "-", "1", "2", "3", "4", "5", "6", "7", "8",
    "=", "[", "]", "@", "c", "n", "o", "s", "X", ".",
]
UNK_INDEX = len(FCD_TOKENS)          # 35
VOCAB_SIZE = len(FCD_TOKENS) + 1     # 36 incl. UNK
MAX_LEN = 350

_TWO_CHAR = [t for t in FCD_TOKENS if len(t) == 2]


def tokenize_smiles(smiles: str) -> List[int]:
    """Greedy two-char-first tokenization (fcd one-hot convention)."""
    out: List[int] = []
    i = 0
    while i < len(smiles):
        two = smiles[i:i + 2]
        if two in _TWO_CHAR:
            out.append(FCD_TOKENS.index(two))
            i += 2
            continue
        ch = smiles[i]
        out.append(FCD_TOKENS.index(ch) if ch in FCD_TOKENS else UNK_INDEX)
        i += 1
    return out


def one_hot_smiles(smiles_list: Sequence[str], max_len: int = MAX_LEN
                   ) -> np.ndarray:
    """[B, max_len, VOCAB_SIZE] float32 one-hot, right-padded with zeros."""
    out = np.zeros((len(smiles_list), max_len, VOCAB_SIZE), np.float32)
    for b, smi in enumerate(smiles_list):
        for i, tok in enumerate(tokenize_smiles(smi)[:max_len]):
            out[b, i, tok] = 1.0
    return out


def lstm_forward(x, w_ih, w_hh, b_ih, b_hh):
    """One torch-layout LSTM layer over x [B,T,D]: weights [4H,D]/[4H,H],
    gate order (i, f, g, o). Returns hidden states [B,T,H]."""
    h_dim = w_hh.shape[1]
    b = x.shape[0]
    bias = (b_ih + b_hh)[None]

    x_proj = jnp.einsum("btd,gd->btg", x, w_ih)  # [B,T,4H]

    def step(carry, xp):
        h, c = carry
        gates = xp + h @ w_hh.T + bias
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((b, h_dim)), jnp.zeros((b, h_dim)))
    _, hs = jax.lax.scan(step, init, jnp.swapaxes(x_proj, 0, 1))
    return jnp.swapaxes(hs, 0, 1)


def chemnet_activations(params: Dict, one_hot: jnp.ndarray) -> jnp.ndarray:
    """Run the stacked LSTM + penultimate Dense; mean-pool over time.

    params: {"lstm": [ {w_ih, w_hh, b_ih, b_hh}, ... ],
             "dense": {kernel, bias} (optional penultimate projection)}
    """
    x = one_hot
    for layer in params["lstm"]:
        x = lstm_forward(x, layer["w_ih"], layer["w_hh"], layer["b_ih"],
                         layer["b_hh"])
    # ChemNet reads the final hidden state of the last layer
    feats = x[:, -1]
    if "dense" in params:
        feats = jnp.tanh(feats @ params["dense"]["kernel"]
                         + params["dense"]["bias"])
    return feats


def convert_torch_chemnet(sd: Dict) -> Dict:
    """torch state dict with nn.LSTM naming (lstm.weight_ih_l{k}, ...) and
    an optional `dense.weight/bias` penultimate layer -> params for
    chemnet_activations. Weights are consumed in torch layout directly."""
    def _np(t):
        try:
            return t.detach().cpu().numpy()
        except AttributeError:
            return np.asarray(t)

    layers = []
    k = 0
    while f"lstm.weight_ih_l{k}" in sd:
        layers.append({
            "w_ih": _np(sd[f"lstm.weight_ih_l{k}"]),
            "w_hh": _np(sd[f"lstm.weight_hh_l{k}"]),
            "b_ih": _np(sd[f"lstm.bias_ih_l{k}"]),
            "b_hh": _np(sd[f"lstm.bias_hh_l{k}"]),
        })
        k += 1
    assert layers, "no lstm.weight_ih_l0 in state dict"
    params: Dict = {"lstm": layers}
    if "dense.weight" in sd:
        params["dense"] = {"kernel": _np(sd["dense.weight"]).T,
                           "bias": _np(sd["dense.bias"])}
    return params


def fcd_from_activations(act_gen: np.ndarray, act_ref: np.ndarray) -> float:
    from reed_tpu.eval.frechet import frechet_distance

    return frechet_distance(
        act_gen.mean(0), np.cov(act_gen, rowvar=False),
        act_ref.mean(0), np.cov(act_ref, rowvar=False))


def fcd_score(params: Dict, gen_smiles: Sequence[str],
              ref_smiles: Sequence[str], batch_size: int = 128,
              max_len: int = MAX_LEN) -> float:
    """FCD between two SMILES sets under a converted ChemNet."""
    fwd = jax.jit(lambda oh: chemnet_activations(
        jax.tree.map(jnp.asarray, params), oh))

    def acts(smiles):
        chunks = []
        for i in range(0, len(smiles), batch_size):
            oh = jnp.asarray(one_hot_smiles(smiles[i:i + batch_size],
                                            max_len))
            chunks.append(np.asarray(jax.device_get(fwd(oh))))
        return np.concatenate(chunks, axis=0)

    return fcd_from_activations(acts(list(gen_smiles)),
                                acts(list(ref_smiles)))
