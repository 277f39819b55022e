"""Guardrail pre-flight scan — the reference's GuardrailCheck job.

Reference: job/GuardrailCheck.scala:22-51 + GuardrailCheckJobSession.java:44-78
+ feature/Guardrail.java:88-125 — scan every origin row, encode every column,
flag rows whose largest column exceeds ``colSizeInKB``; counters READ/VALID/
LARGE.  Here it is a pure streaming map_batches scan (no shuffle at all):
the flagged subset is returned as a Dataset and the counters come from a
tiny aggregate."""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from cassandra_data_migrator_ray.functions.transforms import ByteSizeGuard


@dataclass
class GuardrailResult:
    flagged: ray.data.Dataset  # rows over the threshold (with sizes)
    counters: dict[str, int]  # READ / VALID / LARGE


def guardrail_scan(
    ds: ray.data.Dataset,
    max_kb: float,
    cols: list[str] | None = None,
    batch_size: int | None = 65536,
) -> GuardrailResult:
    guard = ByteSizeGuard(max_kb, cols)

    def check(t: pa.Table) -> pa.Table:
        return guard(t)

    def check_and_filter(t: pa.Table) -> pa.Table:
        out = check(t)
        return out.filter(out["oversize"])

    # MATERIALIZE the flagged subset (small by definition — it is the
    # anomaly list): counting it and later consuming it must not re-read and
    # re-scan the entire input a second time
    flagged = ds.map_batches(
        check_and_filter, batch_format="pyarrow", batch_size=batch_size
    ).materialize()
    total = ds.count()  # metadata-only for parquet/arrow sources
    large = flagged.count()
    return GuardrailResult(
        flagged=flagged,
        counters={"READ": total, "VALID": total - large, "LARGE": large},
    )
