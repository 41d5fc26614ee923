"""Deterministic PaySim-scale CSV generator for the throughput benchmark.

The reference's schema (`/root/reference/Lambda Function/lambda_function_aws.py:70-85`)
is exactly the public PaySim dataset's (6,362,620 rows, ~470 MB) — the
realistic production input implied by BASELINE.md. This generates a
synthetic dataset of the same shape/scale (seeded, reproducible) so
bench.py can measure the fraud-ETL query's single-node throughput at the
reference's own data scale and BASELINE.md can record the reference
engine's (pandas) time on identical input.

Distributions are PaySim-flavored (type mix, ~0.129% fraud rate, the
TRANSFER>200k flagging rule, zero-inflated balances) but the benchmark
only needs scale realism, not statistical fidelity.

Usage: python tools/gen_paysim.py [path] [rows]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

DEFAULT_PATH = "/tmp/spark_graft_paysim/paysim_sf1.csv"
DEFAULT_ROWS = 6_362_620
TYPES = np.array(["PAYMENT", "CASH_OUT", "TRANSFER", "CASH_IN", "DEBIT"])
TYPE_P = np.array([0.34, 0.35, 0.08, 0.22, 0.01])


def _chunk(rng: np.random.Generator, n: int) -> pd.DataFrame:
    typ = rng.choice(TYPES, size=n, p=TYPE_P)
    amount = np.round(rng.lognormal(9.0, 1.5, n), 2)
    old_org = np.where(rng.random(n) < 0.45, 0.0, np.round(rng.lognormal(10.0, 1.6, n), 2))
    # ~90% of rows keep originator-side consistency (filter №1 passes via
    # clause 1 when old >= amount); the rest get a random new balance.
    consistent = rng.random(n) < 0.9
    new_org = np.where(
        consistent,
        np.round(np.maximum(old_org - amount, 0.0), 2),
        np.round(rng.lognormal(9.5, 1.5, n), 2),
    )
    old_dest = np.where(rng.random(n) < 0.35, 0.0, np.round(rng.lognormal(10.5, 1.7, n), 2))
    new_dest = np.where(
        rng.random(n) < 0.8,
        np.round(old_dest + amount, 2),
        np.round(rng.lognormal(10.5, 1.7, n), 2),
    )
    is_fraud = (rng.random(n) < 0.00129).astype(np.int64)
    flagged = ((typ == "TRANSFER") & (amount > 200_000.0)).astype(np.int64)
    return pd.DataFrame(
        {
            "step": rng.integers(1, 744, n),
            "type": typ,
            "amount": amount,
            "nameOrig": np.char.add("C", rng.integers(10**9, 2 * 10**9, n).astype(str)),
            "oldbalanceOrg": old_org,
            "newbalanceOrig": new_org,
            "nameDest": np.char.add(
                np.where(rng.random(n) < 0.66, "C", "M"),
                rng.integers(10**9, 2 * 10**9, n).astype(str),
            ),
            "oldbalanceDest": old_dest,
            "newbalanceDest": new_dest,
            "isFraud": is_fraud,
            "isFlaggedFraud": flagged,
        }
    )


def generate(path: str = DEFAULT_PATH, rows: int = DEFAULT_ROWS, seed: int = 42) -> str:
    """Write the CSV if absent (idempotent cache); returns the path."""
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    tmp = path + ".tmp"
    chunk = 1_000_000
    with open(tmp, "w", newline="") as f:
        written = 0
        first = True
        while written < rows:
            n = min(chunk, rows - written)
            _chunk(rng, n).to_csv(f, index=False, header=first)
            first = False
            written += n
    os.rename(tmp, path)
    return path


if __name__ == "__main__":
    p = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_PATH
    r = int(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_ROWS
    out = generate(p, r)
    print(out, os.path.getsize(out), "bytes")
