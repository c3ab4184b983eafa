"""Published feature-column names (kept verbatim for parity).

Both name lists intentionally misalign with their value orders — the
reference ships that way and downstream consumers key on these names:

- Hayes (``ta_extractor.py:21-36``): names after index 11 are shifted
  (Q1) — the 12 ``*_percentile_*_time`` names actually hold
  number-of-packets / thirty-packet / scalar values.
- SLT (``slt_extractor.py:44-78``): 156 names vs 157 values — the
  ratio pad shifts everything after index 5 and drops the final
  size-std value (see tests/oracle/ref_slt.py).
"""

from __future__ import annotations

HAYES_NAMES: list[str] = (
    ["max_in", "max_out", "max_total", "avg_in", "avg_out", "avg_total",
     "std_in", "std_out", "std_total",
     "75th_percentile_in", "75th_percentile_out", "75th_percentile_total"]
    + [f"{q}th_percentile_{d}_time" for d in ("in", "out", "total") for q in (25, 50, 75, 100)]
    + ["nb_pkts_in", "nb_pkts_out", "nb_pkts_total",
       "nb_pkts_in_f30", "nb_pkts_out_f30", "nb_pkts_in_l30", "nb_pkts_out_l30",
       "std_pkt_conc_out20", "avg_pkt_conc_out20", "avg_per_sec", "std_per_sec",
       "avg_order_in", "avg_order_out", "std_order_in", "std_order_out",
       "medconc", "med_per_sec", "min_per_sec", "max_per_sec", "maxconc",
       "perc_in", "perc_out", "sum_altconc", "sum_alt_per_sec",
       "sum_number_pkts", "sum_intertimestats"]
    + [f"altconc_{i + 1}" for i in range(20)]
    + [f"alt_per_sec_{i + 1}" for i in range(20)]
    + [f"conc_{i + 1}" for i in range(60)]
)
assert len(HAYES_NAMES) == 150

_CKPT = (2, 4, 8, 16, 20)


def _slt_names() -> list[str]:
    names = [f"upstream_ratio_at_{k}pkt_%" for k in _CKPT]
    for d in ("upload", "download", "bidirectional"):
        for k in _CKPT:
            names += [f"{d}_timing_{k}pkt_{s}_ms" for s in ("mean", "max", "min", "std")]
    for d in ("upload", "download", "bidirectional"):
        names += [f"{d}_throughput_{k}pkt_bytes_per_sec" for k in _CKPT]
        names += [f"{d}_packet_rate_{k}pkt_per_sec" for k in _CKPT]
    for d in ("upload", "download", "bidirectional"):
        for k in _CKPT:
            names += [f"{d}_size_{k}pkt_{s}_bytes" for s in ("mean", "max", "min", "std")]
    return names


SLT_NAMES: list[str] = _slt_names()
assert len(SLT_NAMES) == 155

HOST_NAMES: list[str] = [
    "pkts_rate", "duration",
    *[f"{s}_vol_total_pkts" for s in ("mean", "median", "mode", "std", "skew", "kurtosis")],
    *[f"{s}_bytes_sent" for s in ("mean", "median", "mode", "std", "skew", "kurtosis")],
    *[f"{s}_bytes_recv" for s in ("mean", "median", "mode", "std", "skew", "kurtosis")],
    "gap_between_conns",
]

CORR_NAMES: list[str] = [
    "corr_count", "corr_sum", "corr_mean", "corr_median",
    "corr_minimum", "corr_maximum", "corr_range", "corr_variance", "corr_std_dev",
]
