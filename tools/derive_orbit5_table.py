"""Derive the 5-vertex graphlet orbit table (orbits 15..72, Przulj atlas
numbering) by probing a compiled original ORCA binary: for each connected
5-vertex edge-mask, feed the 5-node graph itself to `orca node 5` — each
node then participates in exactly one 5-node induced subgraph (the whole
graph), so exactly one orbit in 15..72 has count 1 per node. The observed
numbering (behavior, not code) is hard-coded into orbit5_table.h.

Run once wherever an original ORCA binary exists:
  g++ -O2 -std=c++11 -o orca_ref <orca.cpp>   # upstream ORCA
  python tools/derive_orbit5_table.py          # expects ./orca_ref in cwd

NOTE: use the 'std' output mode — upstream writeResults() has UB (missing
return at -O2 falls off the function end) and spins forever in file mode.
"""
import itertools, subprocess, os

PAIRS = list(itertools.combinations(range(5), 2))  # 10 pairs, fixed order

def connected(mask):
    adj = [[] for _ in range(5)]
    for b, (i, j) in enumerate(PAIRS):
        if mask >> b & 1:
            adj[i].append(j); adj[j].append(i)
    seen = {0}; stack = [0]
    while stack:
        u = stack.pop()
        for v in adj[u]:
            if v not in seen:
                seen.add(v); stack.append(v)
    return len(seen) == 5

table = {}
for mask in range(1024):
    if not connected(mask):
        continue
    edges = [PAIRS[b] for b in range(10) if mask >> b & 1]
    with open("g.in", "w") as f:
        f.write(f"5 {len(edges)}\n")
        for i, j in edges:
            f.write(f"{i} {j}\n")
    r = subprocess.run(["./orca_ref", "node", "5", "g.in", "std"],
                       capture_output=True, text=True, timeout=20)
    lines = r.stdout.split("orbit counts: \n", 1)[1].strip().splitlines()
    orbits = []
    if True:
        for line in lines[:5]:
            c = list(map(int, line.split()))
            o5 = [k for k in range(15, 73) if c[k] == 1]
            assert len(o5) == 1, (mask, c)
            orbits.append(o5[0])
    table[mask] = orbits

print(len(table), "connected masks")
with open("orbit5_table.txt", "w") as f:
    for mask in sorted(table):
        f.write(f"{mask} {' '.join(map(str, table[mask]))}\n")
