"""ChemNet/FCD: torch nn.LSTM parity for the JAX forward, tokenizer
round-trips, and the FCD statistic's closed forms."""

import numpy as np
import pytest

from reed_tpu.eval.chemnet import (
    VOCAB_SIZE,
    convert_torch_chemnet,
    fcd_score,
    one_hot_smiles,
    tokenize_smiles,
)

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


def test_tokenizer_two_char_first():
    toks = tokenize_smiles("CCl")
    assert toks == [0, 5]          # C, Cl — not C, C, l(UNK)
    toks = tokenize_smiles("c1ccccc1")
    assert all(t < VOCAB_SIZE for t in toks)
    assert len(toks) == 8


def test_one_hot_shape_and_padding():
    oh = one_hot_smiles(["CO", "C"], max_len=5)
    assert oh.shape == (2, 5, VOCAB_SIZE)
    assert oh[0].sum() == 2 and oh[1].sum() == 1
    assert oh[1, 1:].sum() == 0    # right-padded


class TChemNet(tnn.Module):
    def __init__(self, d_in, hidden, layers, d_out):
        super().__init__()
        self.lstm = tnn.LSTM(d_in, hidden, num_layers=layers,
                             batch_first=True)
        self.dense = tnn.Linear(hidden, d_out)

    def forward(self, x):
        hs, _ = self.lstm(x)
        return torch.tanh(self.dense(hs[:, -1]))


def test_lstm_parity_with_torch():
    torch.manual_seed(0)
    tmodel = TChemNet(VOCAB_SIZE, 24, 2, 16).eval()
    oh = one_hot_smiles(["CCO", "c1ccccc1", "CC(=O)N"], max_len=12)
    with torch.no_grad():
        tout = tmodel(torch.tensor(oh)).numpy()

    from reed_tpu.eval.chemnet import chemnet_activations
    import jax
    import jax.numpy as jnp

    params = convert_torch_chemnet(tmodel.state_dict())
    out = np.asarray(chemnet_activations(
        jax.tree.map(jnp.asarray, params), jnp.asarray(oh)))
    assert np.max(np.abs(out - tout)) < 1e-5


def test_fcd_zero_for_identical_sets():
    torch.manual_seed(1)
    tmodel = TChemNet(VOCAB_SIZE, 16, 1, 8).eval()
    params = convert_torch_chemnet(tmodel.state_dict())
    smiles = ["CCO", "CCN", "c1ccccc1", "CC(=O)O", "CCC", "CO", "CN",
              "C=O"]
    score = fcd_score(params, smiles, list(smiles), max_len=16)
    assert abs(score) < 1e-6


def test_fcd_separates_different_sets():
    torch.manual_seed(1)
    tmodel = TChemNet(VOCAB_SIZE, 16, 1, 4).eval()
    with torch.no_grad():
        # default init gives a near-contractive LSTM whose features barely
        # separate sets; widen for a discriminative random net
        for p in tmodel.parameters():
            p.normal_(0, 0.8)
    params = convert_torch_chemnet(tmodel.state_dict())
    a = ["CCO", "CCN", "CCC", "CO", "CN", "C=O", "CCF", "CCCl",
         "CC(C)O", "CC(C)N", "CCCC", "CCOC"]
    b = ["c1ccccc1", "c1ccncc1", "c1ccoc1", "c1ccsc1", "c1cnccn1",
         "c1ccc2ccccc2c1", "c1ccccc1C", "c1ccccc1N", "c1ccccc1O",
         "c1ccccc1F", "c1ccccc1Cl", "c1ccc(cc1)C"]
    same = fcd_score(params, a, list(a), max_len=24)
    diff = fcd_score(params, a, b, max_len=24)
    assert diff > same + 1e-6
    assert diff > 0
