"""Per-transformer micro-benchmarks (the analog of the reference's
generated go-bench harness, worker/pkg/benthos/transformers/
benchmarks_test.go) — single-threaded pandas rows/sec per transformer;
multiply by executor cores for cluster throughput (all transformers are
embarrassingly parallel)."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd

from neosync_spark.functions import transformers as X

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000


def main() -> None:
    keys = pd.Series([f"conv-{i % 997}|{i % 16}" for i in range(N)])
    emails = pd.Series([f"user{i}@corp{i % 7}.io" for i in range(N)])
    texts = pd.Series(
        [
            f"lorem ipsum {i} contact user{i}@x.io call +1-555-{i % 10000:04d}"
            for i in range(N)
        ]
    )
    names = pd.Series([f"Name{i % 100}" for i in range(N)])
    nums = pd.Series(np.arange(N) % 10_000, dtype="Int64")
    nulls = pd.Series([None] * N, dtype=object)

    cases = {
        "transform_email": (X.transform_email(preserve_domain=True), emails),
        "transform_first_name": (X.transform_first_name(), names),
        "transform_full_name": (X.transform_full_name(), names),
        "transform_string": (X.transform_string(), names),
        "transform_character_scramble": (X.transform_character_scramble(), texts),
        "transform_int64": (X.transform_int64(), nums),
        "transform_float64": (X.transform_float64(), nums.astype("Float64")),
        "transform_string_phone_number": (
            X.transform_string_phone_number(),
            pd.Series([f"+1-555-{i % 10000:04d}" for i in range(N)]),
        ),
        "transform_uuid": (X.transform_uuid(), names),
        "transform_pii_text": (X.transform_pii_text(), texts),
        "generate_email": (X.generate_email(), nulls),
        "generate_full_name": (X.generate_full_name(), nulls),
        "generate_int64": (X.generate_int64(), nulls),
        "generate_categorical": (X.generate_categorical(), nulls),
        "generate_card_number": (X.generate_card_number(), nulls),
        "generate_ssn": (X.generate_ssn(), nulls),
        "generate_uuid": (X.generate_uuid(), nulls),
    }
    cases["transform_javascript"] = (
        X.transform_javascript("return value + '|' + key;"),
        names,
    )
    out = {}
    for name, (fn, vals) in cases.items():
        fn(vals.head(1000), keys.head(1000))  # warm-up (numpy/regex init)
        best = None
        for _ in range(3):  # noisy shared VM: take the best of 3
            t0 = time.time()
            fn(vals, keys)
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(N / best)

    # small-batch JS: the case the persistent Node worker exists for —
    # per-batch process spawns would dominate at this granularity
    js = X.transform_javascript("return value + '!';")
    small_v, small_k = names.head(100), keys.head(100)
    js(small_v, small_k)  # warm (spawns the worker)
    t0 = time.time()
    n_calls = 200
    for _ in range(n_calls):
        js(small_v, small_k)
    js_batches = round(n_calls / (time.time() - t0), 1)

    print(json.dumps({
        "rows": N,
        "rows_per_sec_1core": out,
        "js_small_batch_100rows_batches_per_sec": js_batches,
    }, indent=1))


if __name__ == "__main__":
    main()
