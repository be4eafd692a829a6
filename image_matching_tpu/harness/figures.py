"""Figure generation from latency.csv runs — the reference's
generate_figures.sh + tools/figures/*.py equivalents:

  * membership / identification scalability (log-log server compute vs DB
    size, one line per approach)
  * end-to-end time vs network bandwidth at a fixed DB size (computation +
    analytic transfer time from ciphertext counts x ciphertext bytes /
    bandwidth — the reference models the network the same way,
    tools/figures/15{Membership,Index}Totals.csv)
  * sign-approximation accuracy sweep (chebyshevCompare fixture,
    tools/figures/signApproxAll.py)

Usage: python -m image_matching_tpu.harness.figures latency.csv [outdir]
"""

from __future__ import annotations

import csv
import math
import os
import sys
from collections import defaultdict

import numpy as np

BANDWIDTHS = {  # label -> bytes/sec (reference tools/figures/idBandwidth.py)
    "64 Kbps": 8192,
    "2 Mbps": 262144,
    "1 Gbps": 134217728,
    "20 Gbps": 2684354560,
}


def _load(csv_path):
    rows = []
    with open(csv_path) as f:
        for row in csv.DictReader(f):
            rows.append(row)
    return rows


def ciphertext_bytes(ring_dim=32768, limbs=14):
    """Serialized size of one fresh 2-component ciphertext."""
    return 2 * limbs * ring_dim * 4


def generate(csv_path: str, outdir: str = "figures"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(outdir, exist_ok=True)
    rows = _load(csv_path)

    # scalability: per-approach membership/index compute vs DB size
    for phase, col in (("membership", "Membership Computation (seconds)"),
                       ("identification", "Index Computation (seconds)")):
        series = defaultdict(list)
        for r in rows:
            series[r["Experimental Approach"]].append(
                (int(r["Database Size (vectors)"]), float(r[col]))
            )
        plt.figure(figsize=(6, 4))
        for name, pts in sorted(series.items()):
            pts.sort()
            plt.loglog([p[0] for p in pts], [p[1] for p in pts],
                       marker="o", label=name)
        plt.xlabel("database size (vectors)")
        plt.ylabel("server computation (s)")
        plt.title(f"{phase} scalability (TPU)")
        plt.grid(True, which="both", alpha=0.3)
        plt.legend()
        plt.tight_layout()
        plt.savefig(os.path.join(outdir, f"{phase}_scalability.png"), dpi=150)
        plt.close()

    # bandwidth: end-to-end = compute + (query + result cts) * bytes / bw
    plt.figure(figsize=(6, 4))
    for name in sorted({r["Experimental Approach"] for r in rows}):
        biggest = max(
            (r for r in rows if r["Experimental Approach"] == name),
            key=lambda r: int(r["Database Size (vectors)"]),
        )
        comp = float(biggest["Membership Computation (seconds)"]) + float(
            biggest["Query Encryption (seconds)"]
        )
        n_cts = int(biggest["Query Size (ciphertexts)"]) + int(
            biggest["Membership Result Size (ciphertexts)"]
        )
        xs, ys = [], []
        for label, bw in BANDWIDTHS.items():
            xs.append(bw)
            ys.append(comp + n_cts * ciphertext_bytes() / bw)
        plt.loglog(xs, ys, marker="s", label=name)
    plt.xlabel("network bandwidth (B/s)")
    plt.ylabel("end-to-end membership (s)")
    plt.grid(True, which="both", alpha=0.3)
    plt.legend()
    plt.tight_layout()
    plt.savefig(os.path.join(outdir, "membership_bandwidth.png"), dpi=150)
    plt.close()
    print(f"figures written to {outdir}/")


def sign_approx_table(outpath: str = "figures/sign_approx.csv",
                      delta: float = 0.44, degree: int = 59):
    """Numeric fixture for the composed sign approximation (float64 model
    of chebyshevCompare) — reference tools/figures/signApprox.csv."""
    from ..ckks import poly_eval as pe

    cheb = pe.chebyshev_coefficients(
        lambda v: 1.0 if v >= delta else -1.0, degree
    )
    xs = np.linspace(-1, 1, 401)
    y = np.polynomial.chebyshev.chebval(xs, cheb)
    f4 = np.polyval(pe.F4_COEFS[::-1], y)
    composed = f4 + 1.0
    os.makedirs(os.path.dirname(outpath) or ".", exist_ok=True)
    with open(outpath, "w") as f:
        f.write("x,chebyshev,composed,target\n")
        for x, c, comp in zip(xs, y, composed):
            tgt = 2.0 if x >= delta else 0.0
            f.write(f"{x},{c},{comp},{tgt}\n")
    return xs, composed


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "latency.csv"
    out = sys.argv[2] if len(sys.argv) > 2 else "figures"
    generate(path, out)
    sign_approx_table(os.path.join(out, "sign_approx.csv"))
