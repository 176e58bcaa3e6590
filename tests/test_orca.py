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


# -- node 5 (orbits 15..72, Przulj atlas numbering) --------------------------

def test_node5_path5():
    from reed_tpu.eval.orca import count_node_orbits5

    out = count_node_orbits5(5, [[0, 1], [1, 2], [2, 3], [3, 4]])
    assert out.shape == (5, 73)
    # P5: ends orbit 15, second orbit 16, middle orbit 17
    assert list(np.argwhere(out[:, 15:])[:, 1] + 15) == [15, 16, 17, 16, 15]
    # 4-node sub-orbits unchanged from the node-4 counter
    assert list(out[:, 4]) == [1, 1, 0, 1, 1]


def test_node5_star_cycle_k5():
    from reed_tpu.eval.orca import count_node_orbits5

    star = count_node_orbits5(5, [[0, i] for i in range(1, 5)])
    assert star[0, 23] == 1 and (star[1:, 22] == 1).all()
    c5 = count_node_orbits5(5, [[0, 1], [1, 2], [2, 3], [3, 4], [0, 4]])
    assert (c5[:, 34] == 1).all()
    k5 = count_node_orbits5(
        5, [[i, j] for i in range(5) for j in range(i + 1, 5)])
    assert (k5[:, 72] == 1).all()
    # K5 contains 5 K4s; each node is in 4
    assert (k5[:, 14] == 4).all()


def test_node5_matches_node4_prefix():
    from reed_tpu.eval.orca import count_node_orbits4, count_node_orbits5

    rng = np.random.default_rng(3)
    n = 14
    edges = np.argwhere(np.triu(rng.random((n, n)) < 0.3, 1))
    o4 = count_node_orbits4(n, edges)
    o5 = count_node_orbits5(n, edges)
    assert (o5[:, :15] == o4).all()


def test_node5_cli():
    from reed_tpu.eval.orca import orca_binary_path

    binary = orca_binary_path()
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        inp = os.path.join(d, "g.in")
        with open(inp, "w") as f:
            f.write("5 5\n0 1\n1 2\n2 3\n3 4\n0 4\n")
        r = subprocess.run([binary, "node", "5", inp, "std"],
                           capture_output=True, text=True, check=True)
        lines = r.stdout.split("orbit counts: \n", 1)[1].strip().splitlines()
        row = list(map(int, lines[0].split()))
        assert len(row) == 73
        assert row[34] == 1
