"""Analytical compute/communication scaling model for partitioned
full-graph training (BASELINE target: >=75% edges/s efficiency from 1
host to N).

The halo-partitioned layer does, per device and per layer:
  compute: local SpMM over E_p edges (HBM-gather bound, NOT FLOPs
           bound -- see PERF_NOTES.md "gather wall") + dense GEMMs
  comm:    one all_to_all of P*H boundary feature rows over ICI
           (intra-slice) and/or DCN (across slices)

Efficiency is estimated from a roofline on those two terms. With the
planned-halo tier the exchange overlaps interior aggregation
(parallel/halo_plan.py), so the overlapped estimate applies; the flat
tier pays the serial sum.

Hardware constants default to TPU v5e; override for other parts.
"""

from typing import NamedTuple

import numpy as np

__all__ = ["HwModel", "V5E", "halo_scaling_estimate"]


class HwModel(NamedTuple):
    """Per-chip hardware model (defaults: TPU v5e)."""
    hbm_gbps: float = 819.0          # HBM bandwidth, GB/s
    ici_gbps: float = 186.0          # ICI bandwidth per chip, GB/s
    dcn_gbps: float = 25.0           # DCN bandwidth per host, GB/s
    bf16_tflops: float = 197.0       # MXU peak, TFLOP/s
    spmm_edges_per_s: float = 180e6  # measured bf16 F=256 (BENCH_r01)


V5E = HwModel()


def halo_scaling_estimate(num_parts, edges_per_part, halo_rows_sent,
                          feat_dim, itemsize=2, hw: HwModel = V5E,
                          dcn_rows_sent=0, overlap=True,
                          total_edges=None):
    """Roofline estimate of halo-partitioned SpMM scaling efficiency.

    Args:
      num_parts: devices in the partition.
      edges_per_part: max edges owned by one device (padded count).
      halo_rows_sent: boundary rows one device sends over ICI per layer
        (sum over peers; the all_to_all also receives ~the same).
      feat_dim: feature width of the exchanged/aggregated activations.
      itemsize: bytes per element (2 = bf16).
      dcn_rows_sent: rows crossing slice boundaries (hier tier), if any.
      overlap: True models the planned tier (exchange hidden behind
        interior aggregation); False models the flat tier (serial).

    Returns dict with per-layer times (s) and the estimated efficiency
    vs a single device running the whole graph at the same edge rate
    (the BASELINE ">=75% edges/s 1->N" metric).
    """
    t_compute = edges_per_part / hw.spmm_edges_per_s
    ici_bytes = halo_rows_sent * feat_dim * itemsize
    dcn_bytes = dcn_rows_sent * feat_dim * itemsize
    t_ici = ici_bytes / (hw.ici_gbps * 1e9)
    t_dcn = dcn_bytes / (hw.dcn_gbps * 1e9)
    t_comm = t_ici + t_dcn
    if overlap:
        t_layer = max(t_compute, t_comm)
    else:
        t_layer = t_compute + t_comm
    if total_edges is None:
        total_edges = edges_per_part * num_parts  # incl. padding
    # efficiency: useful edges/s of the N-device run vs N chips each
    # running at the single-device rate (padding edges are NOT useful
    # throughput, so pass true total_edges when known)
    eff = ((total_edges / t_layer) / (num_parts * hw.spmm_edges_per_s)
           if t_layer > 0 else 1.0)
    return {
        "num_parts": int(num_parts),
        "t_compute_s": t_compute,
        "t_ici_s": t_ici,
        "t_dcn_s": t_dcn,
        "t_layer_s": t_layer,
        "ici_bytes": int(ici_bytes),
        "dcn_bytes": int(dcn_bytes),
        "overlap": bool(overlap),
        "efficiency": float(min(eff, 1.0)),
    }
