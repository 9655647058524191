"""Python UDTFs (Spark 4 user-defined TABLE functions).

Completes the reference's user-function surface (SURVEY §2.G: UDF / UDAF /
UDTF): the engine already ships a grouped-agg pandas UDAF
(`weighted_value_mean_udaf`) and grouped-map kernels (`applyInPandas`);
this module adds a real `@udtf` consumed as
``SELECT * FROM f(TABLE(...) PARTITION BY ... ORDER BY ...)``.

Semantics note: with a PARTITION BY table argument Spark instantiates the
UDTF once per partition and feeds rows in ORDER BY order, calling
``terminate`` at partition end — exactly the per-key sequential-scan
contract run-length encoding needs, with cross-partition parallelism for
free. The class lives in this importable module so workers unpickle it by
reference (``shipping.ensure_shipped`` puts the package zip on every
worker's sys.path).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(
    returnType="user_id bigint, event_type string, run_len bigint, "
    "run_start_us bigint"
    # NOT useArrow=True: a conf-level A/B
    # (spark.sql.execution.pythonUDTF.arrow.enabled) read ~10% faster, but
    # the decorator flag measured a consistent 7× REGRESSION (12.8 s vs
    # 1.8 s median) under the full bench's PARTITION BY TABLE argument —
    # pickled-row transport stays
)
class RunLengthEncode:
    """Collapse consecutive same-type events per user into runs.

    Input rows (one partition = one user, ordered by (tus, event_id)):
    (user_id, event_type, tus).  Emits one row per maximal run with its
    length and start timestamp — the sequential gaps-and-islands scan,
    O(1) state per partition.
    """

    def __init__(self) -> None:
        self._user = None
        self._etype = None
        self._len = 0
        self._start = None

    def _flush(self):
        if self._len:
            yield self._user, self._etype, self._len, self._start

    def eval(self, row):  # noqa: D102 — TABLE args arrive as one Row
        if self._len and row["event_type"] == self._etype:
            self._len += 1
            return
        yield from self._flush()
        self._user, self._etype = row["user_id"], row["event_type"]
        self._len, self._start = 1, row["tus"]

    def terminate(self):  # noqa: D102
        yield from self._flush()
