"""Parquet table loaders for the driver-generated test warehouse.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet per table under an sf dir.

At 100 TB these reads become partitioned-directory scans; everything here
goes through ``spark.read.parquet`` so predicate pushdown / column pruning /
partition pruning apply unchanged.
"""

from __future__ import annotations

import os
import threading
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_DIMS = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Self-configure on whatever session the caller (e.g. the verify driver)
    # passes in: events.parquet carries TIMESTAMP(NANOS) which Spark rejects
    # unless read as long, and time-bucketing semantics assume UTC.
    from ..shipping import ensure_shipped
    ensure_shipped(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    # TIMESTAMP(NANOS) parquet columns surface as nanos-since-epoch longs
    # (spark.sql.legacy.parquet.nanosAsLong) — convert to TimestampType with
    # microsecond truncation, matching DuckDB's ns→us read of the same file.
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


# Scale-adaptive input fan-out (optimization guide §2.5 "input skew"):
# a parquet file with ONE row group is an unsplittable input — Spark
# assigns each row group to a single scan task, so every narrow stage
# over such a table (tokenize/shingle explodes, MinHash signature
# folds, stride-1 fingerprint generators, Arrow GEMM kernels) runs on
# ONE core no matter how many the session has. When the scan yields
# fewer partitions than the session's parallelism, a round-robin
# repartition up to parallelism spreads that narrow work across the
# cores for the price of one small local shuffle (the whole table is
# test-scale by construction when this fires). On a production-scale
# table the scan already yields >= parallelism splits and this is a
# NO-OP — the decision derives from the actual input layout at build
# time, not from a tuned constant, so the 100 TB plan never shuffles
# documents (pinned by the plan tests, which disable the device via
# this conf to capture the production shape).
FAN_OUT_CONF = "spark.flowPipeline.fanOutSmallScans"
_SCAN_PARTS_CACHE: "dict[tuple[str, str, int], int]" = {}


def fan_out_small_scan(df: DataFrame, spark: SparkSession,
                       path: str) -> DataFrame:
    """Repartition ``df`` (a fresh parquet scan of ``path``) up to the
    session's default parallelism iff the scan yields fewer partitions.
    The partition count is memoized per (app, path, parallelism) — it is
    a pure function of file layout and session conf, and computing it
    plans the scan's RDD, which is not free to repeat per query build."""
    if str(spark.conf.get(FAN_OUT_CONF, "true")).lower() != "true":
        return df
    want = spark.sparkContext.defaultParallelism
    # key includes the split-affecting scan confs (round-11, ADVICE r10):
    # a session that changes maxPartitionBytes/openCostInBytes mid-app
    # would otherwise reuse a stale count (performance-only wrongness —
    # a skipped or superfluous repartition — but cheap to key correctly).
    # Inputs regenerated in place within one app remain out of scope:
    # the warehouse is immutable per application by contract (the
    # events-cache content signature handles cross-app regeneration).
    # no-default get: these confs always resolve, and passing a ""
    # default trips Spark 4's typed-conf validation on vanilla sessions
    key = (spark.sparkContext.applicationId, os.path.abspath(path), want,
           spark.conf.get("spark.sql.files.maxPartitionBytes"),
           spark.conf.get("spark.sql.files.openCostInBytes"))
    parts = _SCAN_PARTS_CACHE.get(key)
    if parts is None:
        parts = df.rdd.getNumPartitions()
        _SCAN_PARTS_CACHE[key] = parts
    if parts >= want:
        return df
    return df.repartition(want)


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so ``spark.sql`` queries match the
    DuckDB oracle's pre-registered view names."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def _events_content_sig(path: str) -> str:
    """Cheap content signature of the events source (file or directory
    parquet): per-part size + mtime_ns + head/tail bytes. A warehouse
    regenerated IN PLACE (same path) almost always changes the parquet
    footer (row-group stats live in the tail), so the signature — and
    the cache key — changes instead of silently serving the previous
    warehouse's rows (round-7 review; same head+footer device as
    plans._artifact_dir). The byte sampling is PROBABILISTIC, not a
    full-content hash: a regeneration confined strictly to mid-file
    bytes with identical sizes would keep the same sample — mtime_ns
    is folded in as the cheap discriminator for exactly that case
    (round-7 advice; a rewrite that also forges mtime is outside the
    threat model of a local test-warehouse cache)."""
    import hashlib

    h = hashlib.md5()

    def one(f: str) -> None:
        st = os.stat(f)
        h.update(f"{os.path.basename(f)}:{st.st_size}:{st.st_mtime_ns}"
                 .encode())
        with open(f, "rb") as fh:
            h.update(fh.read(65536))
            if st.st_size > 65536:
                fh.seek(max(st.st_size - 65536, 0))
                h.update(fh.read(65536))

    if os.path.isdir(path):
        for fn in sorted(os.listdir(path)):
            if fn.endswith(".parquet"):
                one(os.path.join(path, fn))
    elif os.path.exists(path):
        one(path)
    return h.hexdigest()[:12]


def _events_cache_dir(sf_dir: str) -> str:
    """Cache location for :func:`partitioned_events_dir`, keyed on the
    FULL path digest plus the events content signature, not the
    basename alone: ``/run1/sf0.01`` and ``/run2/sf0.01`` collided on
    one cache entry and the second caller silently read the FIRST
    warehouse's rows (round-7 review). The basename stays as a
    human-readable prefix; the per-user root avoids cross-user /tmp
    squatting (plans._cache_root's hardening)."""
    import hashlib

    from ..cachedir import user_cache_root

    norm = os.path.abspath(os.path.normpath(sf_dir))
    sig = _events_content_sig(os.path.join(norm, "events.parquet"))
    tag = "{}_{}_{}".format(os.path.basename(norm) or "sf",
                            hashlib.md5(norm.encode()).hexdigest()[:12],
                            sig)
    # the root carries the squat/symlink/uid defenses (cachedir —
    # round-7 review: this cache had re-implemented the root without
    # them, leaving the predictable path plantable by another user)
    return os.path.join(user_cache_root("flow_pipeline_partitioned"),
                        tag, "events_by_day")


# Reader grace before a superseded events_by_day cache may be deleted:
# 2x the bench retry budget (RETRY_BUDGET_SEC=900 in bench.py), per
# round-8 advice — a straddling multi-pass bench re-resolves (and so
# re-touches the lease) at each pass, so lease age only has to cover
# one retried pass, but the margin is cheap. A background ticker
# (round-9 advice) additionally re-touches every lease this process
# has resolved while the process lives, so lease age bounds time since
# the reading PROCESS was alive — a single query pass longer than the
# grace (large SF on a slow host) can no longer have its cache
# rmtree'd mid-read by a concurrent regeneration.
_READER_GRACE_SEC = 1800
_LEASE = "._reader_lease"
_LEASE_REFRESH_SEC = 60
_RESOLVED_CACHES: "set[str]" = set()
_TICKER_LOCK = threading.Lock()
_TICKER_STARTED = False


def _touch_lease(cache_dir: str) -> None:
    """Record 'a reader resolved this cache now' — cleanup of superseded
    sibling caches keys on this, because directory mtime does not
    advance on reads."""
    try:
        with open(os.path.join(cache_dir, _LEASE), "w") as fh:
            fh.write(str(os.getpid()))
    except OSError:
        pass                # lease is advisory; resolve must not fail


def _refresh_leases_once() -> None:
    """One ticker pass: re-touch the lease of every cache this process
    has resolved and that still exists (a cache deleted out from under
    us — only possible after the process was presumed dead — drops out
    of the registry). Runs in the daemon ticker thread; also called
    directly by tests."""
    with _TICKER_LOCK:
        caches = list(_RESOLVED_CACHES)
    for c in caches:
        if os.path.isdir(c):
            _touch_lease(c)
        else:
            with _TICKER_LOCK:
                _RESOLVED_CACHES.discard(c)


def _register_reader(cache_dir: str) -> None:
    """Keep ``cache_dir``'s lease fresh for this process's lifetime.
    Spark reads the resolved path LAZILY — possibly much later and for
    longer than the grace — so resolve-time touching alone bounds only
    the time since a pass STARTED (round-9 advice). The daemon thread
    dies with the process; leases then age out normally and cleanup
    proceeds."""
    global _TICKER_STARTED
    with _TICKER_LOCK:
        _RESOLVED_CACHES.add(cache_dir)
        if _TICKER_STARTED:
            return
        _TICKER_STARTED = True

    def loop() -> None:
        while True:
            time.sleep(_LEASE_REFRESH_SEC)
            _refresh_leases_once()

    threading.Thread(target=loop, name="events-cache-lease-ticker",
                     daemon=True).start()


def _lease_mtime(cache_dir: str) -> float:
    try:
        return os.stat(os.path.join(cache_dir, _LEASE)).st_mtime
    except OSError:
        return 0.0


def partitioned_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per sf dir) a Date-partitioned copy of ``events``
    — the layout the raw-persist MV writes in production
    (streaming/jobs.py:start_raw_persist; toDate partition key per
    clickhouse create.sh:45 ``PARTITION BY Date``) — and return its path.

    Scans of this layout with a ``day`` predicate prune at the DIRECTORY
    level (``PartitionFilters`` in the plan): at 100 TB a one-week query
    touches 7 day-directories, not the whole table. The copy is cached
    under /tmp keyed by the sf dir name and guarded by parquet's _SUCCESS
    marker; a half-finished concurrent write is invisible (written to a
    unique tmp dir, renamed into place atomically).
    """
    import shutil
    import tempfile

    dest = _events_cache_dir(sf_dir)
    if os.path.exists(os.path.join(dest, "_SUCCESS")):
        _touch_lease(dest)
        _register_reader(dest)
        return dest

    parent = os.path.dirname(dest)          # <root>/<tag>
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="events_by_day_", dir=parent)
    (load_table(spark, sf_dir, "events")
     .withColumn("day", F.to_date("ts"))
     .repartition("day")          # one task per day-dir, no tiny files
     .write.mode("overwrite").partitionBy("day").parquet(tmp))
    if (os.path.isdir(dest)
            and not os.path.exists(os.path.join(dest, "_SUCCESS"))):
        shutil.rmtree(dest)  # clear a half-finished previous write
    try:
        os.rename(tmp, dest)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # concurrent writer won
    _touch_lease(dest)
    _register_reader(dest)
    # content-keyed tags strand the PREVIOUS warehouse's full copy when
    # the data is regenerated in place — clear superseded siblings (same
    # basename+path-digest prefix, older content signature), but only
    # AFTER this cache's _SUCCESS is published and only siblings no
    # straddling process is still reading. Reader tracking is by LEASE
    # file, not dir mtime (round-8 advice: a dir's mtime is set at
    # creation and never advances on reads, so the old 15-min dir-mtime
    # grace still rmtree'd a cache out from under a >15-min reader).
    # Every resolve touches the lease AND registers the cache with the
    # process-lifetime refresh ticker (_register_reader), so lease age
    # bounds the time since a reading process was last ALIVE — not
    # merely since it started a pass (round-9 advice); the grace is
    # sized at 2x the bench retry budget (900 s) on top of that.
    root, tag = os.path.split(parent)
    stale_prefix = tag.rsplit("_", 1)[0] + "_"
    cutoff = time.time() - _READER_GRACE_SEC
    for sib in os.listdir(root):
        if sib == tag or not sib.startswith(stale_prefix):
            continue
        sib_path = os.path.join(root, sib)
        try:
            newest = max(
                os.stat(sib_path).st_mtime,
                _lease_mtime(os.path.join(sib_path, "events_by_day")))
            if newest < cutoff:
                shutil.rmtree(sib_path, ignore_errors=True)
        except OSError:
            pass                        # racer already cleaned it
    return dest
