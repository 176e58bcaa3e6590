"""ORCA graphlet counting: closed-form orbit counts on known graphs."""

import subprocess

import numpy as np
import pytest

from reed_tpu.eval.orca import count_node_orbits4, orca_binary_path


def test_triangle():
    # K3: each node degree 2, one triangle, no 4-node graphlets
    out = count_node_orbits4(3, [[0, 1], [1, 2], [0, 2]])
    assert out.shape == (3, 15)
    assert (out[:, 0] == 2).all()      # degree
    assert (out[:, 3] == 1).all()      # triangle orbit
    assert out[:, 4:].sum() == 0


def test_path4():
    # P4: 0-1-2-3
    out = count_node_orbits4(4, [[0, 1], [1, 2], [2, 3]])
    assert list(out[:, 0]) == [1, 2, 2, 1]
    # P3 orbits: ends {0,2},{1,3}; middles 1,2
    assert list(out[:, 1]) == [1, 1, 1, 1]
    assert list(out[:, 2]) == [0, 1, 1, 0]
    # P4 orbits: ends orbit 4, middles orbit 5
    assert list(out[:, 4]) == [1, 0, 0, 1]
    assert list(out[:, 5]) == [0, 1, 1, 0]


def test_star():
    # claw: center 0 with leaves 1,2,3
    out = count_node_orbits4(4, [[0, 1], [0, 2], [0, 3]])
    assert out[0, 7] == 1 and (out[1:, 6] == 1).all()


def test_cycle4():
    out = count_node_orbits4(4, [[0, 1], [1, 2], [2, 3], [3, 0]])
    assert (out[:, 8] == 1).all()


def test_k4():
    edges = [[i, j] for i in range(4) for j in range(i + 1, 4)]
    out = count_node_orbits4(4, edges)
    assert (out[:, 14] == 1).all()
    # K4 contains 4 triangles; each node is in 3
    assert (out[:, 3] == 3).all()
    # diamond orbits come only from induced subgraphs — none in K4
    assert out[:, 12].sum() == 0 and out[:, 13].sum() == 0


def test_diamond():
    # K4 minus edge (0,3)
    edges = [[0, 1], [0, 2], [1, 2], [1, 3], [2, 3]]
    out = count_node_orbits4(4, edges)
    assert list(out[:, 12]) == [1, 0, 0, 1]
    assert list(out[:, 13]) == [0, 1, 1, 0]


def test_paw():
    # triangle 0,1,2 with pendant 3 on node 2
    edges = [[0, 1], [1, 2], [0, 2], [2, 3]]
    out = count_node_orbits4(4, edges)
    assert out[3, 9] == 1
    assert out[0, 10] == 1 and out[1, 10] == 1
    assert out[2, 11] == 1


def test_cli_matches_library(tmp_path):
    edges = [[0, 1], [1, 2], [2, 3], [3, 0], [0, 2]]
    inp = tmp_path / "g.txt"
    inp.write_text("4 5\n" + "\n".join(f"{u} {v}" for u, v in edges) + "\n")
    res = subprocess.run([orca_binary_path(), "node", "4", str(inp), "std"],
                         capture_output=True, text=True, check=True)
    header = "orbit counts: \n"
    body = res.stdout[res.stdout.find(header) + len(header):]
    cli = np.array([[int(x) for x in line.split()]
                    for line in body.strip().split("\n")])
    lib = count_node_orbits4(4, edges)
    assert np.array_equal(cli, lib)


def test_disconnected_and_dup_edges():
    out = count_node_orbits4(5, [[0, 1], [1, 0], [2, 3]])
    assert list(out[:, 0]) == [1, 1, 1, 1, 0]
    assert out[:, 1:].sum() == 0
