"""All-pairs shortest path by BFS (Graphormer precompute).

Reference: gammagl/utils/shortest_path.py. Host-side numpy; unreachable
pairs get -1.
"""

import numpy as np

__all__ = ["shortest_path"]


def shortest_path(edge_index, num_nodes, max_dist=None):
    ei = np.asarray(edge_index)
    adj = [[] for _ in range(num_nodes)]
    for s, d in ei.T:
        adj[s].append(int(d))
    dist = np.full((num_nodes, num_nodes), -1, dtype=np.int64)
    for start in range(num_nodes):
        dist[start, start] = 0
        frontier = [start]
        d = 0
        while frontier:
            d += 1
            if max_dist is not None and d > max_dist:
                break
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if dist[start, v] < 0:
                        dist[start, v] = d
                        nxt.append(v)
            frontier = nxt
    return dist
