"""BI serving boundary — the engine's views over the SAME wire a
Power BI / Tableau / beeline consumer uses.

The reference serves its analytical layer to Power BI through SQL
Server ODBC (`/root/reference/README.md:54`,
`sql/db_creation_script.sql:185-205`). The Spark-native equivalent of
that boundary is the HiveServer2 Thrift protocol: Spark ships
`HiveThriftServer2` (the JDBC/ODBC endpoint every Spark BI connector
— including Power BI's "Azure HDInsight / Spark" connector — speaks),
and this module mounts the engine's temp views on it in-process.

- :func:`start_bi_endpoint` registers the analytic views
  (`vw_recent_rankings`, `vw_player_clan`) plus any caller-supplied
  DataFrames as GLOBAL temp views, then starts the Thrift server
  bound to this session. Global (not session-local) is the correct
  production posture: HiveServer2 clones a NEW Spark session per
  JDBC connection (multi-session isolation), and the global-temp
  database is the supported cross-session publication surface —
  consumers address views as ``global_temp.vw_recent_rankings``
  (the endpoint's ``jdbc_url`` already points there via ``use
  database``).
- :func:`jdbc_query` is the e2e proof: it connects back over the
  genuine Hive JDBC driver (``org.apache.hive.jdbc.HiveDriver`` on
  Spark's own classpath) and fetches rows through the wire protocol,
  exactly as an external ODBC/JDBC consumer would — not via the
  in-process DataFrame API.

Scale notes: the Thrift server executes queries on the attached
SparkSession, so a query against `vw_recent_rankings` plans the same
broadcast-join + top-k the DataFrame surface plans — serving adds a
protocol, not an execution path. On a real cluster this runs on the
driver of a long-lived application (or Spark Connect for
multi-tenant isolation); connection fan-in is bounded by
``hive.server2.thrift.max.worker.threads`` (default 500).

NOTE: the Thrift port is read from the live Hadoop configuration at
server start (``hive.server2.thrift.port``). HiveThriftServer2 is a
ONE-PER-JVM singleton with a terminal stop (a HiveServer2 service
cannot re-init once STOPPED) — the endpoint is expected to live as
long as the driver, and "restart" means restarting the application,
exactly like the reference's SQL Server service. A second
``start_bi_endpoint`` in one process raises a clear error instead of
hanging on a dead listener.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# HiveServer2's service lifecycle is terminal on stop — one endpoint
# per JVM (see module docstring). Tracked here to fail fast.
_STARTED = False


class BiEndpoint:
    """Handle for a running Thrift JDBC/ODBC endpoint."""

    def __init__(self, spark: SparkSession, port: int, server) -> None:
        self.spark = spark
        self.port = port
        self._server = server

    @property
    def jdbc_url(self) -> str:
        return f"jdbc:hive2://localhost:{self.port}/default"

    def stop(self) -> None:
        if self._server is not None:
            self._server.stop()
            self._server = None


def start_bi_endpoint(
    spark: SparkSession,
    port: int,
    views: dict[str, DataFrame] | None = None,
    lake=None,
) -> BiEndpoint:
    """Mount the engine's analytical views on a HiveServer2 Thrift
    endpoint. ``views`` maps view names to DataFrames to expose in
    addition to (or instead of) the lake's standard analytic views;
    pass ``lake`` to register `vw_recent_rankings` / `vw_player_clan`
    from it."""
    global _STARTED
    if _STARTED:
        raise RuntimeError(
            "HiveThriftServer2 is one-per-JVM (its stop is terminal); "
            "the BI endpoint lives as long as the driver — restart the "
            "application to rebind, or mount additional views on the "
            "running endpoint with publish_views()."
        )
    if lake is not None:
        from .analytics import vw_player_clan, vw_recent_rankings

        vw_recent_rankings(lake).createOrReplaceGlobalTempView(
            "vw_recent_rankings"
        )
        vw_player_clan(lake).createOrReplaceGlobalTempView(
            "vw_player_clan"
        )
    for name, df in (views or {}).items():
        df.createOrReplaceGlobalTempView(name)
    # the server reads its port from the live Hadoop configuration at
    # start; startWithSparkSession adopts THIS session's state, so
    # temp views are visible without the (static) singleSession flag
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "hive.server2.thrift.port", str(port)
    )
    hts = spark._jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
    server = hts.startWithSparkSession(spark._jsparkSession, False)
    _wait_listening(port)
    _STARTED = True
    return BiEndpoint(spark, port, server)


def publish_views(views: dict[str, DataFrame]) -> None:
    """Mount additional views on the RUNNING endpoint — global temp
    views are resolved per query, so new publications are visible to
    already-connected BI clients immediately (the live-deploy path;
    no endpoint restart needed)."""
    for name, df in views.items():
        df.createOrReplaceGlobalTempView(name)


def _wait_listening(port: int, timeout_s: float = 30.0) -> None:
    """Block until the Thrift listener accepts TCP connections —
    startWithSparkSession returns before the acceptor thread binds,
    and a BI client connecting in that window sees ECONNREFUSED."""
    import socket
    import time

    deadline = time.monotonic() + timeout_s
    while True:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=1):
                return
        except OSError:
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"Thrift endpoint did not bind port {port} within "
                    f"{timeout_s}s"
                )
            time.sleep(0.2)


def jdbc_query(
    spark: SparkSession, endpoint: BiEndpoint, sql: str
) -> list[tuple]:
    """Execute ``sql`` against the endpoint over the REAL Hive JDBC
    wire (DriverManager → HiveDriver → Thrift), returning rows as
    tuples — the external-consumer path, not the in-process
    DataFrame API. Bounded by contract: BI result sets are
    page-sized (the views LIMIT/aggregate)."""
    jvm = spark._jvm
    jvm.java.lang.Class.forName("org.apache.hive.jdbc.HiveDriver")
    conn = jvm.java.sql.DriverManager.getConnection(
        endpoint.jdbc_url, "engine", ""
    )
    try:
        st = conn.createStatement()
        rs = st.executeQuery(sql)
        meta = rs.getMetaData()
        ncols = meta.getColumnCount()
        out: list[tuple] = []
        while rs.next():
            out.append(
                tuple(rs.getObject(i + 1) for i in range(ncols))
            )
        return out
    finally:
        conn.close()
