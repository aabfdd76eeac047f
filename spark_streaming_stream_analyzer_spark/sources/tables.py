"""Batch table sources over the driver-generated parquet fixtures.

The reference's only source is a receiver-based Kafka 0.8 DStream
(``KafkaStreamAverageCalculator.java:66-67``). The rebuild's batch
stand-in (SURVEY.md §2.1 #1 ``src_kafka_stream``) is a parquet scan of
the ``events`` table, whose ``props`` JSON-string column plays the role
of the Kafka record value. Streaming sources live in
``streaming/pipelines.py``.

Parquet scans here are where Catalyst pushdown lands: any filter /
column selection applied by downstream operators reaches the scan as
``PushedFilters`` / pruned ``ReadSchema`` — verified in
``tests/test_plans.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The fixture `events.ts` is parquet TIMESTAMP(NANOS), which Spark
    # rejects unless nanos are read as raw longs. Set it here (it is a
    # runtime-settable session conf) so the operator surface works on
    # any caller-provided SparkSession, not just ours. Likewise pin the
    # session timezone: fixture timestamps are UTC-midnight-aligned and
    # the oracle compares date-cast strings, so a caller session in a
    # non-UTC zone must not shift them.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = clean_measurements(df)
    return df


#: Ingest clock-validity window for events, epoch-microseconds UTC:
#: [1990-01-01, 2100-01-01). A reading stamped outside it (a 1969
#: zeroed clock, a year-2200 overflow) is an invalid RECORD, dropped
#: at load in both engines. Beyond correctness, this bounds the grid
#: ops: one corrupt far-future timestamp otherwise inflates an hourly
#: resample/calendar grid by ~60,000x (measured: ts_resample_interp
#: ground through a 2-million-hour grid minted by a single
#: 2200-dated row — the round-8 TIME sweep's job-killer finding).
EVENT_TS_VALID_MIN_US = 631_152_000_000_000
EVENT_TS_VALID_MAX_US = 4_102_444_800_000_000

#: Measurement-magnitude validity bound: |value| <= 1e6 units. The
#: domain twin of the clock-validity window: fixture measurements span
#: [0, ~560], so a reading beyond a MILLION units is sensor garbage
#: (~1800x headroom over real data), exactly as a 2200-dated row is a
#: corrupt clock. The bound is sized so every registered integer-exact
#: kernel keeps >=20x headroom at the cap with whole groups sitting on
#: it: cents (1e8) and their squares (1e16, int64-backed DECIMAL(18)
#: products), 4th moments (1e32 vs HUGEINT's 1.7e38 — the binding
#: constraint: a value near 2^53/100 mints cents^4 ~ 6.6e63, beyond ANY
#: exact type in either engine), and micro-unit cumsums (1e12/row vs
#: int64 windows). Residual envelope (self-review r9): an ALL-CAP
#: group still overflows the HUGEINT 4th-moment sum beyond ~1.7e6
#: rows (1e32 x 1.7e6 = 1.7e38); at the real measurement scale
#: (cents^4 ~ 1e19) the same sum holds to ~1e19-row groups — see
#: higher_moments' docstring. This closes the round-9 adversarial-float crash
#: class: a finite value near ±2^63/100 made round(v*100)::BIGINT
#: overflow in BOTH engines (ANSI CAST_OVERFLOW / DuckDB conversion
#: error — one absurd row killing the job, the same shape as the
#: round-8 NaN and corrupt-clock finds). The comparison is on the RAW
#: double against this literal in both engines (never on v*100), so
#: the cut is bit-identical engine-to-engine.
EVENT_VALUE_ABS_MAX = 1_000_000.0


def clean_measurements(df: DataFrame) -> DataFrame:
    """The events ingest contract, one edit point shared by every
    consumer (batch ``load_table``, streaming ``events_file_stream``,
    the checkpoint pipeline's direct read). Two clauses:

    - **finite measurement** (round-8 NaN/Inf sweep): a non-finite
      ``value`` (NaN / ±Inf — broken sensor, JSON "Infinity") is a
      MISSING reading, i.e. NULL. Without this, one NaN in 100 TB
      kills every exact-cents job in both engines (Spark ANSI
      CAST_OVERFLOW on round(NaN*100)::BIGINT; DuckDB the same cast
      error) — 64 of 327 registered queries crashed on a NaN/Inf
      fixture. NULLing keeps row counts and event sequences intact
      and converts the class to the already-hardened NULL-value
      regime. Round 9 extends the same clause to magnitude: a finite
      value beyond ``EVENT_VALUE_ABS_MAX`` (±1e6 units — sensor
      garbage by domain, and on the way to the ±2^63/100 CAST
      overflow that kills both engines) is equally a missing
      reading.
    - **valid clock** (round-8 TIME sweep): a row stamped outside
      [``EVENT_TS_VALID_MIN_US``, ``EVENT_TS_VALID_MAX_US``) — or
      with no timestamp at all — is not an analyzable event and is
      DROPPED. A time-series engine keys everything on ts; garbage
      clocks both diverge the engines (giant hour indices push the
      exact OLS into last-ulp float territory) and DoS the calendar
      grids (see the constant's docstring).

    The DuckDB oracles carry the identical contract via a mechanical
    shadow CTE (``registry._shadow_finite_events``). At every real sf
    the fixture is all-finite and in-window, so this is an identity.
    """
    if "ts" in df.columns:
        # Compare the RAW column against literals of its own type so the
        # window reaches the parquet scan as PushedFilters (the round-9
        # guard A/B measured the unwrapped form at ~18% of the flagship's
        # wall; `unix_micros(cast(ts))` blocked pushdown and paid a
        # per-row conversion). Wall-clock boundaries equal the epoch-us
        # constants because load_table pins the session timezone to UTC.
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":  # TIMESTAMP(NANOS) vintage read as raw longs
            valid = (F.col("ts") >= EVENT_TS_VALID_MIN_US * 1000) & (
                F.col("ts") < EVENT_TS_VALID_MAX_US * 1000
            )
        elif dt == "timestamp_ntz":  # current fixture vintage
            # NTZ literals are session-timezone-independent, so this
            # is safe even for callers that never pinned the session
            # to UTC (heartbeat census, ckpt direct read)
            valid = (
                F.col("ts") >= F.expr("TIMESTAMP_NTZ '1990-01-01 00:00:00'")
            ) & (F.col("ts") < F.expr("TIMESTAMP_NTZ '2100-01-01 00:00:00'"))
        else:
            # instant-typed ('timestamp') vintage: a TIMESTAMP literal
            # resolves through the SESSION timezone, which not every
            # caller pins to UTC — keep the instant-correct epoch-us
            # comparison here (self-review r9). No current fixture
            # takes this branch, so the pushdown win stays where the
            # data is.
            us = F.unix_micros(F.col("ts"))
            valid = (us >= EVENT_TS_VALID_MIN_US) & (
                us < EVENT_TS_VALID_MAX_US
            )
        df = df.filter(valid)
    if "value" not in df.columns:
        return df
    c = F.col("value")
    finite = (
        ~F.isnan(c)
        & (c != F.lit(float("inf")))
        & (c != F.lit(float("-inf")))
        # magnitude validity: see EVENT_VALUE_ABS_MAX (round 9)
        & (F.abs(c) <= F.lit(EVENT_VALUE_ABS_MAX))
    )
    return df.withColumn("value", F.when(finite, c))


def ts_timestamp(df: DataFrame, col: str = "ts") -> Column:
    """``events.ts`` as a proper TIMESTAMP, whatever the fixture
    vintage: older fixtures carry parquet TIMESTAMP(NANOS) read as a
    bigint of epoch-nanos (``nanosAsLong``), current ones a native
    timestamp[us] (read as TIMESTAMP_NTZ). Integer DIV for the nanos
    branch: ts ≈ 1.7e18 exceeds double's 2^53 mantissa, so a float
    divide would corrupt microseconds. The NTZ branch casts through
    the session timezone, which ``load_table`` pins to UTC."""
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return F.timestamp_micros(F.expr(f"{col} DIV 1000"))
    return F.col(col).cast("timestamp")


def ts_micros(df: DataFrame, col: str = "ts") -> Column:
    """``events.ts`` as bigint epoch-microseconds (both vintages) —
    the integer form every exact-arithmetic operator and the DuckDB
    oracle's ``epoch_us(ts)`` agree on."""
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return F.expr(f"{col} DIV 1000")
    return F.unix_micros(F.col(col).cast("timestamp"))


def load_table_cpu(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a table for a CPU-heavy per-row stage (md5 shingling,
    tokenization, Pandas-UDF decode), guaranteeing the scan has at
    least ``defaultParallelism`` partitions.

    A CPU-bound stage must never have fewer partitions than cores. The
    local fixtures are single parquet files with one row group, which
    the reader cannot split — so e.g. ``documents`` (500 KB) arrives as
    ONE partition and a shingling pass runs on 1 of 32 cores. A
    round-robin repartition of the raw rows is a trivially cheap
    shuffle (input ≪ the per-row compute it unlocks) and is a no-op
    decision on a real 100 TB layout where file count already exceeds
    core count — there the scan arrives with ample partitions and we
    skip the repartition entirely.
    """
    df = load_table(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df


#: Hive-partitioned-write key-length contract (round-12 CATKEY probe):
#: a partition VALUE is spelled into a directory name
#: (``key=<url-escaped value>``), and common filesystems cap a path
#: segment at 255 bytes — one 10,000-char category value crashed every
#: partitionBy writer in the repo (TASK_WRITE_FAILED mid-job: the
#: one-hostile-row DoS shape yet again, this time in the LAYOUT tier).
#: A value whose UTF-8 encoding exceeds this cap is UNPARTITIONABLE
#: and is routed to the hive default (null) partition before the
#: write — the same observable the format already imposes on the
#: empty string (round-9 groupkey sweep: '' is unrepresentable as a
#: directory and reads back NULL). 80 bytes leaves margin for the
#: ``key=`` prefix plus full %XX URL-escaping (3x worst case: 80*3+11
#: = 251 < 255). Oracles mirror with
#: ``CASE WHEN octet_length(k) <= 80 THEN NULLIF(k, '') END``.
PARTITION_KEY_MAX_BYTES = 80


def partitionable_key(col: str) -> Column:
    """The partition-key projection every ``partitionBy`` writer uses:
    over-long values (see ``PARTITION_KEY_MAX_BYTES``) become NULL and
    land in the hive default partition instead of crashing the write."""
    c = F.col(col)
    return F.when(F.octet_length(c) <= PARTITION_KEY_MAX_BYTES, c)


#: Byte cap for FORCED broadcasts of tables whose cardinality grows
#: with the corpus/fact data (vocab rank dictionaries, per-doc size
#: tables, per-node degree tables). A forced ``F.broadcast`` hint
#: bypasses the session's 64 MB auto threshold, so at 100 TB an
#: unconditional hint on a vocab-derived table is a driver/executor
#: OOM (guide §3.1/§5 — VERDICT r13 item 4). The gate bounds the
#: broadcast by the DERIVING SOURCE's on-disk bytes: every row of such
#: a derived table embeds at least one distinct token / doc id / node
#: key present in the source, so |derived| is within a small constant
#: of |source bytes|. 64 MB of compressed parquet keeps the worst-case
#: derived table in the low hundreds of MB — far under the 8 GB /
#: 512M-row broadcast hard cap. Driver-side file metadata only: the
#: gate costs no Spark job, no extra action (the KCORE_BCAST_CAP
#: discipline without a count). Env-overridable for cluster tuning;
#: the local fixtures (<11 MB) sit far under any sane cap, so local
#: plans keep the exact same BroadcastHashJoins.
BCAST_SRC_CAP_BYTES = int(
    os.environ.get("SPARK_GRAFT_BCAST_SRC_CAP", str(64 << 20))
)


def _source_bytes(sf_dir: str, table: str) -> int:
    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(root, f))
                for root, _, files in os.walk(path)
                for f in files
            )
        return os.path.getsize(path)
    except OSError:
        # unknown layout -> refuse the forced hint; the planner/AQE
        # still converts to broadcast at runtime if genuinely small
        return 1 << 62


def bcast_gated(df: DataFrame, sf_dir: str, table: str = "documents"):
    """``F.broadcast(df)`` gated on the deriving source table's bytes
    (see ``BCAST_SRC_CAP_BYTES``). Over the cap the hint is dropped and
    the join falls back to the planner's choice (sort-merge / shuffled
    hash, or AQE's runtime broadcast conversion when the table turns
    out small) instead of force-building an unbounded hash relation."""
    if _source_bytes(sf_dir, table) <= BCAST_SRC_CAP_BYTES:
        return F.broadcast(df)
    return df


#: MATERIALIZATION POLICY (the one central caveat — ADVICE r13).
#: Operators materialize a multi-consumer subtree with
#: ``localCheckpoint(eager=False)``: blocks land in executor-local
#: storage at the default MEMORY_AND_DISK level (spill-safe for memory
#: pressure) and the lineage is TRUNCATED. On a single host that is
#: free insurance; on a real cluster an executor loss (preemption,
#: dynamic allocation) makes the truncated lineage unrecomputable and
#: the QUERY fails and retries from scratch instead of recomputing one
#: partition. That trade is sound for these bounded-latency batch
#: queries (a retry costs one query, not a pipeline), but a long
#: multi-query job on flaky infrastructure should swap this helper to
#: ``persist(StorageLevel.MEMORY_AND_DISK_2)`` or a reliable
#: ``checkpoint()`` — one edit point, every routed site follows.
def materialize_once(df: DataFrame) -> DataFrame:
    """Materialize a subtree consumed by 2+ downstream branches (the
    rescan rule, round 13): executor-local, lazy (builds inside the
    first consuming job), lineage-truncating. See the policy note
    above for the cluster fault-tolerance trade."""
    return df.localCheckpoint(eager=False)


def load_documents_keyed(
    spark: SparkSession, sf_dir: str, cpu: bool = True
) -> DataFrame:
    """Documents with REQUIRED identity: rows with a NULL ``doc_id``
    are dropped (round-12 DOCKEY probe). The identity-KEYED operators
    — dedup keep/filter, winnowing fingerprints, novelty first-claim,
    pack positions, reservoir samples, shard manifests, the binary
    tier's payload keys — emit or join on ``doc_id``; a document
    without identity is unaddressable there, and leaving it in either
    ANSI-killed the kernel (``int(None)`` in the mapInPandas decode
    tier) or silently diverged the engines (NULLS FIRST/LAST ordering,
    NULL-group merges). Oracles of exactly those operators carry the
    mirror (``registry._shadow_keyed_documents``). Content-keyed ops
    (quality scores, language ID, token counts, TF-IDF...) do NOT use
    this loader — a NULL-id document still has analyzable text, and
    their parity on NULL ids is attested by the DOCKEY sweep. NULL-id
    drop is observable via dq_constraint_audit-style profiling, and a
    no-op on every real fixture (ids are dense there).

    Negative and near-int64-max ids are VALID identities (attested 0
    divergence; the one negative-id bug — src_binary_files' filename
    regex — is fixed and pinned). Duplicate ids are a declared
    PRECONDITION instead: see tests/test_empty_corpus.py DOCKEY notes.
    """
    loader = load_table_cpu if cpu else load_table
    return loader(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> None:
    """Register fixture tables as temp views for ``spark.sql``."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
