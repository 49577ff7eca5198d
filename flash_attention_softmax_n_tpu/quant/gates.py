"""Outlier gates: analysis statistics -> per-layer quantization decisions.

The north star's closing loop (BASELINE.json): the analysis subpackage's
online activation statistics validate outlier suppression at each bit-width.
softmax-N removes activation outliers (the reference's motivating claim,
README.md:4); these gates turn the measured excess kurtosis into an
automated go/no-go per layer per bit-width.

Heuristic thresholds: heavier tails (higher kurtosis) mean absmax scaling
wastes integer range on rare outliers. INT8 tolerates moderate tails; INT4's
15 levels need near-Gaussian activations; FP8 (e4m3) has wide dynamic range
and tolerates more.
"""

from __future__ import annotations

from typing import Dict, Mapping

__all__ = ["KURTOSIS_THRESHOLDS", "outlier_gate", "gate_report"]

# max acceptable excess kurtosis per bit-width (normal distribution = 0)
KURTOSIS_THRESHOLDS: Dict[int, float] = {
    8: 12.0,   # int8
    4: 3.0,    # int4
    -8: 50.0,  # fp8 e4m3
}


def outlier_gate(stats: Mapping[str, Mapping[str, float]],
                 bits: int = 8) -> Dict[str, bool]:
    """Per-tap pass/fail for quantizing at ``bits``.

    ``stats``: activation statistics dict (analysis.activation_stats_to_dict
    output, or the reference's JSON format — both carry 'kurtosis').
    """
    if bits not in KURTOSIS_THRESHOLDS:
        raise ValueError(f"no threshold defined for bits={bits}")
    thr = KURTOSIS_THRESHOLDS[bits]
    return {name: float(entry["kurtosis"]) <= thr
            for name, entry in stats.items()}


def gate_report(stats: Mapping[str, Mapping[str, float]]) -> Dict[str, Dict]:
    """Full report: per tap, the measured kurtosis and each bit-width verdict."""
    report = {}
    for name, entry in stats.items():
        k = float(entry["kurtosis"])
        report[name] = {
            "kurtosis": k,
            "int8_ok": k <= KURTOSIS_THRESHOLDS[8],
            "int4_ok": k <= KURTOSIS_THRESHOLDS[4],
            "fp8_ok": k <= KURTOSIS_THRESHOLDS[-8],
        }
    return report
