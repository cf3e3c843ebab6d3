"""Structured-streaming jobs mirroring the reference's MV cascade.

Reference topology (SURVEY §3.1): Kafka `flows` topic → ClickHouse Kafka
engine → MV into `flows_raw` (MergeTree, PARTITION BY Date) → MV into
`flows_5m` (SummingMergeTree partial sums, merged by background compaction /
OPTIMIZE). The Go path (inserter/inserter.go:90-196) micro-batches INSERTs
into Postgres at 100 rows / 5 s.

Spark mapping:
- each MV = one Structured Streaming query with its own checkpoint
  (exactly-once file-sink semantics — strictly better than the reference's
  mark-before-flush "roughly once", inserter.go:176-196 / SURVEY W2);
- `flows_raw` = Date-partitioned parquet append (S8). Partitioning by Date
  reproduces ClickHouse PARTITION BY (create.sh:61) and gives partition
  pruning to every dashboard query that emits a Date conjunct;
- `flows_5m` = per-micro-batch partial aggregates appended to a parquet
  rollup dir — the literal SummingMergeTree model (partials now, merge
  later). `run_compaction` is OPTIMIZE TABLE (README.md:164-173). Readers
  always re-aggregate (compact_rollup) so un-merged partials are invisible,
  exactly like ClickHouse's `GROUP BY` over SummingMergeTree.
  This design needs NO watermark: late rows just create new partial rows for
  old slots, merged at next compaction — unbounded lateness, eventually
  consistent (SURVEY W5), with bounded state (no streaming agg state at all).
- the JDBC inserter = foreachBatch batch append with a 5-s
  processing-time trigger (flush.dur parity; Spark has no count trigger —
  SURVEY W1); `start_transactional_inserter` adds a per-epoch batch-id
  ledger (rows + ledger mark commit in ONE transaction) for true
  exactly-once — strictly better than the reference's mark-before-flush
  "roughly once" (inserter.go:176-196), which loses the tail on crash.

At scale: raw persist is shuffle-free (source partitions → files); the
rollup's foreachBatch aggregation shuffles only each micro-batch (tiny), and
compaction shuffles only the rollup (≪ raw).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.rollup import compact_rollup, rollup_flat

_DEFAULT_TRIGGER = {"processingTime": "5 seconds"}


def _start_file_sink(df: DataFrame, out_dir: str, checkpoint_dir: str, *,
                     partition_by: str | None = None,
                     trigger: dict | None = None) -> StreamingQuery:
    """Shared parquet file sink (exactly-once via Spark's file-sink
    commit log) — the writeStream boilerplate the file-sink MVs share,
    factored so the per-sink differences (partition column, trigger)
    read at a glance instead of across eight drifting copies (round-7
    review)."""
    writer = (df.writeStream.format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint_dir))
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer = (writer.outputMode("append")
              .trigger(**(trigger or _DEFAULT_TRIGGER)))
    return writer.start()


def _start_foreach_batch(df: DataFrame, fn, checkpoint_dir: str, *,
                         output_mode: str = "update",
                         trigger: dict | None = None) -> StreamingQuery:
    """Shared foreachBatch starter — checkpoint + trigger boilerplate;
    delivery semantics are the CALLBACK's responsibility (each caller
    documents its idempotence/ledger story)."""
    writer = (df.writeStream.foreachBatch(fn)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode(output_mode)
              .trigger(**(trigger or _DEFAULT_TRIGGER)))
    return writer.start()


def start_raw_persist(flows_stream: DataFrame, out_dir: str,
                      checkpoint_dir: str, *,
                      trigger: dict | None = None) -> StreamingQuery:
    """S8/P1/P3 — flows (epoch-seconds stream) → Date-partitioned parquet.

    The projection is the flows_raw MV (create.sh:64-68): epoch→timestamp
    casts + Date column.
    """
    from ..sources.mocker import flows_raw
    return _start_file_sink(flows_raw(flows_stream), out_dir,
                            checkpoint_dir, partition_by="Date",
                            trigger=trigger)


def start_enriched_persist(flows_stream: DataFrame, asn_dim: DataFrame,
                           out_dir: str, checkpoint_dir: str, *,
                           trigger: dict | None = None) -> StreamingQuery:
    """J1 streaming — the enrichment processor the reference DESCRIBES but
    never ships (reference README.md:44-51: "IP addresses can be mapped to
    countries, ASN or customer information"; output columns reserved at
    pb-ext/flow.pb.go:140-143), as a continuous MV: the flow stream
    stream-static joined against the AS dimension, filling SrcCountry/
    DstCountry/SrcASDB/DstASDB, persisted Date-partitioned like flows_raw.

    Stream-static joins need no watermark or state: the static side is
    re-resolved per micro-batch (so a dim update takes effect at the next
    trigger — the enrichment-refresh semantics a production pipeline
    wants), and the dim is broadcast, so the streaming side never
    shuffles. Scale: identical plan per micro-batch to the batch
    ``enrich_by_asn`` — broadcast hash join, zero fact shuffle.
    """
    from ..operators.enrich import enrich_by_asn
    from ..sources.mocker import flows_raw
    enriched = enrich_by_asn(flows_raw(flows_stream), asn_dim)
    return _start_file_sink(enriched, out_dir, checkpoint_dir,
                            partition_by="Date", trigger=trigger)


def _write_rollup_epoch(batch_df: DataFrame, batch_id: int,
                        rollup_dir: str) -> None:
    """One epoch's partial rollup rows, written REPLAY-IDEMPOTENTLY:
    each epoch owns its ``epoch=N`` subdirectory and a replayed epoch
    overwrites exactly that directory. The round-7 review caught the
    previous plain ``mode("append")``: foreachBatch is at-least-once,
    so a crash between the parquet append and the checkpoint commit
    re-appended the same partials — and the summing algebra means
    duplicates INFLATE every later read/compaction, permanently.
    Readers discover ``epoch`` as a partition column and re-aggregate
    through compact_rollup, which drops it.

    The epoch lands inside the CURRENT pointer version (see
    :func:`_swap_in`), and the pointer is re-checked after the write: a
    concurrent compaction that published mid-write would otherwise
    leave this epoch in the superseded snapshot (the compaction's own
    salvage passes usually carry it, but the appender closes its own
    race instead of relying on the racer). If the superseded snapshot
    was ALREADY GC'd (two publishes completed inside one epoch write),
    the write itself failed or the data is gone — raise so the
    streaming engine replays the epoch (the overwrite is idempotent)."""
    target_root = _resolve_store(rollup_dir) or _init_store(rollup_dir)
    ep = f"epoch={batch_id}"
    (rollup_flat(batch_df)
     .write.mode("overwrite")
     .partitionBy("Date")
     .parquet(os.path.join(target_root, ep)))
    while True:
        cur = _resolve_store(rollup_dir)
        if cur == target_root:
            return
        src = os.path.join(target_root, ep)
        if not os.path.isdir(src):
            raise OSError(
                f"rollup epoch {batch_id} at {rollup_dir} was "
                f"garbage-collected mid-write (two compactions "
                f"published inside one epoch) — replaying the epoch")
        _merge_copy(src, os.path.join(cur, ep))
        target_root = cur


def start_rollup_stream(flows_raw_stream: DataFrame, rollup_dir: str,
                        checkpoint_dir: str, *,
                        trigger: dict | None = None) -> StreamingQuery:
    """S9/A7/W4/W5 — per-micro-batch partial 5-min rollup.

    foreachBatch aggregates ONLY the current micro-batch (partial sums per
    rollup key) and writes it to a per-epoch directory — stateless
    streaming, the SummingMergeTree insert path (create.sh:92-110), made
    exactly-once by epoch-scoped overwrite (:func:`_write_rollup_epoch`).
    Merge happens at read/compaction. Layout note: ``rollup_dir`` gains
    an ``epoch=N`` partition level; start fresh dirs with this layout, or
    run :func:`run_compaction` once on a legacy flat dir first (it
    migrates the layout by writing its merged output as ``epoch=-1``).
    """

    def write_partials(batch_df: DataFrame, batch_id: int) -> None:
        _write_rollup_epoch(batch_df, batch_id, rollup_dir)

    return _start_foreach_batch(flows_raw_stream, write_partials, checkpoint_dir,
                                output_mode="update",
                                trigger=trigger)


def start_index_upsert_stream(emb_stream: DataFrame, index_dir: str,
                              checkpoint_dir: str,
                              centroid_rows: "list[tuple[int, list]]",
                              codebooks: "list[list[list[float]]]", *,
                              trigger: dict | None = None,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding"
                              ) -> StreamingQuery:
    """Streaming IVF-PQ index maintenance — the ingestion loop of a
    serving ANN deployment (the FAISS add() contract, made continuous):
    each micro-batch of newly embedded vectors is encoded with the
    STORED codebooks and cell-assigned with the STORED centroids
    (operators/similarity.py:pq_index_delta — two map-side passes, no
    shuffle, cost linear in the batch), then appended to the
    cell-partitioned codes table.

    Exactly-once by the rollup tier's epoch device
    (:func:`_write_rollup_epoch`'s rationale): each epoch owns its
    ``epoch=N`` subdirectory and a replayed at-least-once foreachBatch
    epoch OVERWRITES exactly that directory instead of duplicating
    rows — duplicated code rows would not inflate sums here, but they
    would double ADC candidates and break the upsert ≡ rebuild
    contract. Layout: ``index_dir/epoch=N/cell=K/`` — ``cell`` stays a
    partition level, so the probe join's dynamic partition pruning
    still performs the inverted-list seek on the read path; seed the
    base build as the reserved ``epoch=-1`` (stream epochs are >= 0,
    the rollup migration convention). Readers
    ``spark.read.parquet(index_dir)`` and drop ``epoch``; queries run
    :func:`~..operators.similarity.ivf_pq_query` unchanged. Model
    staleness (codebooks never retrain in this loop) is the documented
    trade — the retrain schedule republishes a new index generation,
    which is the pointer-store protocol's job, not this appender's."""
    from ..operators.similarity import pq_index_delta

    def write_epoch(batch_df: DataFrame, batch_id: int) -> None:
        delta = pq_index_delta(batch_df, centroid_rows, codebooks,
                               id_col=id_col, vec_col=vec_col)
        (delta.write.mode("overwrite").partitionBy("cell")
         .parquet(os.path.join(index_dir, f"epoch={batch_id}")))

    return _start_foreach_batch(emb_stream, write_epoch, checkpoint_dir,
                                output_mode="append", trigger=trigger)


# ---------------------------------------------------------------------------
# Versioned store layout (the swap-managed state-store protocol)
#
# Every swap-managed store (rollup compaction, CDC store, uniq/bitmap/KMV
# state stores) is a directory of immutable-once-published SNAPSHOT versions
# plus one atomically-replaced pointer file:
#
#     store_dir/
#       _POINTER        one line: "<current> [<previous>]", e.g. "v00000007 v00000006"
#       v00000007/      the published snapshot (parquet; for the rollup,
#                       epoch=*/Date=* subdirs), with a hidden ._merged.json
#                       manifest naming the entries its publish folded in
#       v00000006/      the previously published snapshot, retained one
#                       generation as reader grace, GC'd at the next publish
#
# Publishing = write the new snapshot dir, then atomically replace the
# pointer — one atomic metadata operation. There is NO moment with no
# store, no reader-recovery race, no bounded rename-retry loop, and no
# unrecoverable crash window: the round-7 two-rename protocol documented
# all four and closed only three (jobs.py history); the manifest closes
# the last (see _gc_versions). Every filesystem touch below goes through
# the _IO seam (store_io.LocalStoreIO) — the crash-safety argument rests
# on the seam's four-primitive contract, not on POSIX: on HDFS
# publish_text maps to an atomic rename, on S3-class stores to a
# conditional PUT; the fault-injection suite crash-injects every
# mutating seam call (tests/test_streaming.py).
# ---------------------------------------------------------------------------

from .store_io import LOCAL_IO as _IO  # noqa: E402  (seam; tests swap it)

_PTR = "_POINTER"
_MANIFEST = "._merged.json"
_VERSION_RE = __import__("re").compile(r"^v(\d{8})$")


def _read_pointer(store_dir: str) -> "tuple[str | None, str | None]":
    """(current, previous) version names from the pointer file, or
    (None, None) for an uninitialized store. The pointer is published
    atomically, so a reader sees exactly one full line."""
    try:
        toks = _IO.read_text(os.path.join(store_dir, _PTR)).split()
    except OSError:
        return None, None
    return (toks[0] if toks else None,
            toks[1] if len(toks) > 1 else None)


def _publish_pointer(store_dir: str, current: str,
                     previous: "str | None") -> None:
    """Atomically flip the store pointer (seam primitive 1: crash at
    any point leaves either the old or the new pointer durably — never
    a torn one)."""
    content = current if previous is None else f"{current} {previous}"
    _IO.publish_text(store_dir, _PTR, content + "\n")


def _version_names(store_dir: str) -> "list[str]":
    try:
        return sorted(e for e in _IO.listdir(store_dir)
                      if _VERSION_RE.match(e))
    except OSError:
        return []


def _next_version_name(store_dir: str) -> str:
    """Fresh version name: one past the max of every on-disk version dir
    and both pointer tokens (a crashed unpublished write must never be
    reused under readers that could already list it)."""
    nums = [int(_VERSION_RE.match(n).group(1))
            for n in _version_names(store_dir)]
    for tok in _read_pointer(store_dir):
        m = _VERSION_RE.match(tok or "")
        if m:
            nums.append(int(m.group(1)))
    return "v%08d" % (max(nums) + 1 if nums else 0)


def _read_manifest(vdir: "str | None"):
    """The snapshot's merged-entries manifest: ``"*"`` (this publish
    superseded the ENTIRE previous snapshot — the state-store form), a
    set of entry names folded into the merged output (the compaction
    form), or an empty set when the dir carries no manifest (a legacy
    migration, or an appender-initialized v0 that merged nothing)."""
    if not vdir:
        return set()
    try:
        import json
        merged = json.loads(_IO.read_text(os.path.join(vdir, _MANIFEST)))[
            "merged"]
        return "*" if merged == "*" else set(merged)
    except (OSError, ValueError, KeyError):
        return set()


def _merge_copy(s: str, d: str) -> None:
    """File-level idempotent merge of directory trees (part file names
    are task-attempt-unique, so copy-if-missing at the file level is a
    correct merge; round-7 review: skip-if-dir-exists dropped the second
    fragment of an epoch salvaged in two passes). Each file lands by
    the seam's atomic single-file publish, so a concurrent reader of
    the destination never sees a torn file; ``_SUCCESS`` is copied LAST
    so the completeness gate cannot certify a half-copied epoch.
    Committer internals (dot-files, ``_temporary``) are never copied: a
    mid-write attempt file salvaged out of _temporary can later be
    promoted by its own task commit into a part file with a truncated
    footer."""
    if _IO.isdir(s):
        _IO.makedirs(d)
        names = [n for n in _IO.listdir(s)
                 if not n.startswith(".") and n != "_temporary"]
        for n in sorted(names, key=lambda n: n == "_SUCCESS"):
            _merge_copy(os.path.join(s, n), os.path.join(d, n))
    elif not _IO.exists(d):
        _IO.copy_file_atomic(s, d)


def _salvage_into(src_dir: str, dst_dir: str,
                  known: "set[str]") -> None:
    """Merge-copy every visible top-level entry of ``src_dir`` that is
    neither in ``known`` (already folded into the merged output) nor a
    marker/manifest — the concurrent-appender rescue: epoch directories
    a live start_rollup_stream lands after a compaction's snapshot are
    carried into the new snapshot instead of dying with the GC."""
    try:
        names = _IO.listdir(src_dir)
    except OSError:
        return
    for name in names:
        if name in known or name.startswith((".", "_")):
            continue
        _merge_copy(os.path.join(src_dir, name),
                    os.path.join(dst_dir, name))


def _all_manifests(store_dir: str) -> "dict[str, object]":
    """name -> manifest for EVERY on-disk version, gathered in one pass
    BEFORE any delete. The merged-evidence for an entry of version vX
    can live in any version strictly newer than vX — not just the
    current one: epoch 7 merged at publish P1 is named only in v1's
    manifest, and after P2 (which merges v1's ``epoch=-1`` and names
    {epoch=-1, epoch=8}) that evidence never reappears downstream
    (round-8 review: consulting only the current/retained manifests
    resurrected exactly that epoch as a false orphan, permanently
    double-counting it in the summing rollup). Gathering up front also
    keeps the evidence usable when GC deletes the evidencing version
    itself earlier in the same pass (versions are GC'd newest-first)."""
    return {n: _read_manifest(os.path.join(store_dir, n))
            for n in _version_names(store_dir)}


def _entry_superseded(entry: str, vname: str,
                      manifests: "dict[str, object]") -> bool:
    """True iff some on-disk version STRICTLY NEWER than ``vname``
    proves ``entry`` merged: its manifest names the entry (the
    compaction form) or is ``"*"`` (that publish superseded the entire
    previous snapshot — the state-store form). The manifest chain is
    intact until GC and each publish's content is carried into its
    successor, so the union over newer manifests is exactly the set of
    entries whose data already lives (possibly re-merged several
    generations forward) in the current snapshot."""
    for name, m in manifests.items():
        if name <= vname:
            continue
        if m == "*" or entry in m:
            return True
    return False


def _rescue_copy(src: str, dst: str) -> None:
    """A salvage/sweep merge-copy racing a concurrent publish's GC: if
    the SOURCE version vanishes mid-copy (rmtree between our listdir
    and the copy), the GC that deleted it already proved every entry
    merged or salvaged it itself — skipping is correct, and propagating
    the FileNotFoundError would crash a pure READER'S resolve (round-8
    review; the read contract is 'no recovery, no retry'). A missing
    path mid-copy is ALWAYS that race, even while the entry dir still
    exists: rmtree deletes bottom-up, so a nested part file vanishes
    before its parent (round-9 review — gating the skip on
    ``exists(src)`` reopened exactly the window this fix closes). The
    DESTINATION side can only raise FileNotFoundError when the version
    being assembled was itself superseded and GC'd mid-copy — and that
    GC proved this content merged forward before deleting, so the skip
    is equally correct there. Any OTHER OSError with the source still
    present is a real fault and re-raises."""
    try:
        _merge_copy(src, dst)
    except FileNotFoundError:
        pass
    except OSError:
        if _IO.exists(src):
            raise


def _gc_versions(store_dir: str, keep: "set[str]", cur_path: str) -> None:
    """Delete superseded/garbage version dirs, salvaging first. An entry
    of a doomed version vX is deletable iff some on-disk version
    STRICTLY NEWER than vX proves it merged (:func:`_entry_superseded`
    over manifests gathered before any rmtree — the evidence for an
    old epoch can live in an intermediate version's manifest, and that
    intermediate version may itself be doomed in this very pass) or it
    is physically present in the current snapshot (salvaged, or
    re-landed by the appender's own pointer check); anything else is a
    true orphan — e.g. an epoch that landed between a crashed publish's
    snapshot and its pointer flip — and is merge-copied into the
    current snapshot before the delete. This check is what makes the
    protocol manifest-complete: the two-rename swap's documented
    unrecoverable window (data living only in an unpublished tmp)
    cannot arise, because no version is ever parked or cleared — only
    GC deletes, and GC proves each entry safe or carries it forward."""
    manifests = _all_manifests(store_dir)       # before ANY rmtree
    for name in sorted(set(_version_names(store_dir)) - keep, reverse=True):
        vpath = os.path.join(store_dir, name)
        try:
            entries = _IO.listdir(vpath)
        except OSError:
            continue
        for e in entries:
            if e.startswith((".", "_")):
                continue
            if _entry_superseded(e, name, manifests):
                continue
            if _IO.exists(os.path.join(cur_path, e)):
                continue
            _rescue_copy(os.path.join(vpath, e), os.path.join(cur_path, e))
        _IO.rmtree(vpath)


def _orphan_sweep(store_dir: str, cur_path: str) -> None:
    """Carry true orphans from OLDER versions into the current snapshot
    (same deletability predicate as :func:`_gc_versions`, without the
    delete): after a writer crash between the pointer flip and the
    post-flip salvage, an appender epoch can sit only in the previous
    version — the sweep makes it readable again at the very next
    resolve instead of the next publish. The predicate unions the
    manifests of ALL on-disk versions newer than the orphan candidate's
    (not just the current one): after a crash-before-GC two stale
    versions can coexist, and an epoch merged one generation earlier is
    named only by the INTERMEDIATE version's manifest (round-8 review —
    the current-manifest-only check salvaged such an epoch back in,
    permanently inflating the summing rollup). No-op (one listdir) on
    stores whose manifests are ``"*"`` or whose old entries are all
    merged."""
    cur_name = os.path.basename(cur_path)
    manifests = _all_manifests(store_dir)
    for name in _version_names(store_dir):
        if name >= cur_name:
            continue
        vpath = os.path.join(store_dir, name)
        try:
            entries = _IO.listdir(vpath)
        except OSError:
            continue
        for e in entries:
            if e.startswith((".", "_")):
                continue
            if _entry_superseded(e, name, manifests):
                continue
            if _IO.exists(os.path.join(cur_path, e)):
                continue
            _rescue_copy(os.path.join(vpath, e), os.path.join(cur_path, e))


def _recover_swap(store_dir: str) -> None:
    """On a current-layout store this is a pointer-existence check and
    nothing else (the pointer protocol has no crash state to repair —
    os.replace is atomic). Retained for LEGACY stores written by the
    pre-pointer two-rename protocol: repairs its recognizable crash
    states (``._swap_old`` sibling present), then migrates the flat
    layout into ``v00000000`` + pointer. Migration moves entries within
    the same filesystem and is resumable: a crash mid-move leaves some
    entries at the root and no pointer, and the next call finishes the
    move; quiesce writers of a legacy store for its one migrating call
    (the same caveat the legacy layout already carried for compaction)."""
    import shutil
    old = store_dir.rstrip("/") + "._swap_old"
    if os.path.isdir(old):
        if os.path.isdir(store_dir):
            # superseded legacy snapshot (or, on a pointer-layout store,
            # pure debris a legacy-era crash left behind): remove
            shutil.rmtree(old, ignore_errors=True)
        else:
            try:
                os.rename(old, store_dir)
            except OSError:
                pass    # another reader/writer completed the repair
    leftover_tmp = store_dir.rstrip("/") + "._swap_tmp"
    if os.path.isdir(leftover_tmp):     # legacy unpublished tmp: its
        shutil.rmtree(leftover_tmp, ignore_errors=True)  # epoch replays
    if os.path.isfile(os.path.join(store_dir, _PTR)):
        return
    if not os.path.isdir(store_dir):
        return
    entries = [e for e in os.listdir(store_dir)
               if not _VERSION_RE.match(e) and e != _PTR
               and not e.startswith("._POINTER")]
    if not any(not e.startswith(".") for e in entries):
        return                          # nothing to migrate
    v0 = os.path.join(store_dir, "v00000000")
    os.makedirs(v0, exist_ok=True)
    for e in entries:
        try:
            os.rename(os.path.join(store_dir, e), os.path.join(v0, e))
        except OSError:
            pass                        # concurrent migrator moved it
    _publish_pointer(store_dir, "v00000000", None)


def _resolve_store(store_dir: str) -> "str | None":
    """Path of the current published snapshot, or None for an empty /
    uninitialized store. This is the WHOLE read-side contract now: no
    recovery, no retry — the pointer is always readable and always names
    a complete snapshot (a version dir becomes current only after its
    write finished). Also migrates legacy-layout stores and sweeps
    crash orphans forward (both no-ops on a healthy current store)."""
    _recover_swap(store_dir)
    cur, _ = _read_pointer(store_dir)
    if cur is None:
        return None
    path = os.path.join(store_dir, cur)
    if not _IO.isdir(path):
        raise RuntimeError(
            f"store pointer at {store_dir} names a missing snapshot "
            f"{cur!r} — the store was tampered with outside the swap "
            f"protocol (GC only deletes versions older than the "
            f"pointer's previous token)")
    if len(_version_names(store_dir)) > 1:
        _orphan_sweep(store_dir, path)
    return path


def _init_store(store_dir: str) -> str:
    """Initialize an empty store to an empty ``v00000000`` snapshot and
    return its path (the appender's first-epoch target). Idempotent
    under concurrent initializers: both publish the same pointer."""
    _IO.makedirs(store_dir)
    cur = _resolve_store(store_dir)
    if cur is not None:
        return cur
    v0 = os.path.join(store_dir, "v00000000")
    _IO.makedirs(v0)
    _publish_pointer(store_dir, "v00000000", None)
    return v0


def _swap_in(store_dir: str, write_tmp, *,
             salvage_known: "set[str] | None" = None) -> None:
    """Publish a new store snapshot by version-pointer indirection:
    ``write_tmp(new_version_dir)`` materializes the snapshot into a
    fresh unpublished version dir (invisible to readers — they resolve
    through the pointer), the merged-entries manifest is written beside
    it, the pointer flips atomically, late appender entries are salvaged
    once more, and superseded versions are GC'd (previous is retained
    one generation as reader grace).

    Crash at ANY point is safe: before the flip the old snapshot is
    untouched and the partial new version is garbage the next publish
    GC-checks and deletes; the flip itself is one atomic os.replace;
    after the flip, unmerged appender entries still sitting in the
    previous version are found by the next resolve's orphan sweep or by
    GC's salvage-before-delete (see :func:`_gc_versions`) — there is no
    interleaving, crash or not, in which a checkpoint-committed entry
    has no on-disk home, which retires the two-rename protocol's
    documented unrecoverable window.

    ``salvage_known`` names the top-level entries the caller's snapshot
    already folded into the new version (the compaction form) — entries
    of the current snapshot NOT in it (live-appender epochs landed since
    the caller's read) are merge-copied into the new version before and
    after the flip. ``None`` means the new snapshot supersedes the
    previous one completely (the state-store form; manifest ``"*"``)."""
    import json
    _IO.makedirs(store_dir)
    cur_path = _resolve_store(store_dir)
    cur = os.path.basename(cur_path) if cur_path else None
    nxt = _next_version_name(store_dir)
    new_dir = os.path.join(store_dir, nxt)
    write_tmp(new_dir)
    merged = "*" if salvage_known is None else sorted(salvage_known)
    _IO.publish_text(new_dir, _MANIFEST, json.dumps({"merged": merged}))
    if cur_path is not None and salvage_known is not None:
        _salvage_into(cur_path, new_dir, salvage_known)
    _publish_pointer(store_dir, nxt, cur)
    if cur_path is not None and salvage_known is not None:
        # post-flip pass: an appender epoch that completed into the old
        # current between the pre-flip scan and the flip is carried over
        # as soon as the publish finishes (file-level merge, idempotent
        # with both the pre-flip pass and the appender's own re-land)
        _salvage_into(cur_path, new_dir, salvage_known)
    _gc_versions(store_dir, {nxt} | ({cur} if cur else set()),
                 cur_path=new_dir)


def run_compaction(spark: SparkSession, rollup_dir: str) -> None:
    """D3 — OPTIMIZE TABLE equivalent (README.md:164-173): rewrite the
    rollup with partials merged. Idempotent; safe under repeated runs.

    Bounded retry wrapper: a concurrent appender's epoch REPLAY
    (foreachBatch is at-least-once; the epoch overwrite deletes the
    target dir before rewriting) can delete files between this pass's
    listing and its read — the store's documented reader contract is
    retry-on-transient-FileNotFound, and the compactor is a reader too
    (reproduced by the concurrency stress test). Each retry
    re-snapshots, so the stale listing heals; non-transient errors
    raise immediately."""
    import time
    for attempt in range(4):
        try:
            return _run_compaction_once(spark, rollup_dir)
        except Exception as e:
            klass = _transient_read_error_class(e)
            # fallback (substring-matched) classification is weaker
            # evidence — it can catch a permanent error whose message
            # merely MENTIONS FileNotFoundException (round-8 advice) —
            # so it earns 1 retry, not 3: a real stale listing heals on
            # the first re-snapshot, a permanent error surfaces fast.
            limit = 3 if klass == "condition" else 1
            if klass is None or attempt >= limit:
                raise
            # short backoff so a replaying appender's delete window can
            # pass before the re-snapshot (round-7 advice: immediate
            # retries could hit the same mid-overwrite gap four times)
            time.sleep(0.2 * (attempt + 1))


def _transient_read_error_class(e: Exception) -> "str | None":
    """Is ``e`` one of the stale-listing shapes a concurrent appender's
    epoch overwrite produces (a planned file deleted before execution;
    an epoch dir momentarily EMPTY mid-overwrite so schema inference
    fails)?  Returns the evidence strength, not just a bool:
    ``"condition"`` when Spark's structured error condition matches
    (round-7 advice: the old substring-only match ('does not exist')
    also caught permanent analysis errors phrased the same way, e.g. a
    missing column, and retried them 4x), ``"fallback"`` when a
    condition-less exception (Py4J-wrapped executor IOException)
    matches the substring forms the stress test reproduced — weaker
    evidence, so the caller bounds its retries lower (round-8 advice:
    a permanent message can still MENTION FileNotFoundException) —
    and ``None`` for everything else."""
    cond = None
    for attr in ("getCondition", "getErrorClass"):    # 4.x / 3.x names
        fn = getattr(e, attr, None)
        if callable(fn):
            try:
                cond = fn()
            except Exception:
                cond = None
            if cond:
                break
    if cond:
        ok = cond.split(".")[0] in {
            "PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA", "FAILED_READ_FILE"}
        return "condition" if ok else None
    msg = str(e)
    if ("FAILED_READ_FILE" in msg
            or "FileNotFoundException" in msg
            or "PATH_NOT_FOUND" in msg
            or "UNABLE_TO_INFER_SCHEMA" in msg):
        return "fallback"
    return None


def _is_transient_read_error(e: Exception) -> bool:
    return _transient_read_error_class(e) is not None


def _run_compaction_once(spark: SparkSession, rollup_dir: str) -> None:
    """One compaction pass (see :func:`run_compaction` for the retry
    contract).

    Writes the merge into a fresh unpublished version dir and flips the
    store pointer (:func:`_swap_in`), so concurrent readers see either
    the whole old snapshot or the whole new one; the merged output lands
    as the reserved ``epoch=-1`` partition (stream epochs are >= 0),
    keeping one consistent ``epoch=N/Date=D`` layout — a legacy flat
    Date-partitioned dir is migrated into the versioned layout by
    :func:`_recover_swap` and its Date dirs merged here. Safe to run
    alongside a live :func:`start_rollup_stream`: the input is pinned to
    the epoch directories listed at snapshot time, any epoch the stream
    lands during the rewrite is rescued by the swap's salvage passes or
    re-landed by the appender's own pointer check, and GC proves every
    entry merged/salvaged before deleting a superseded version. Per-Date
    parallel; no cross-partition shuffle (Date is in the group key)."""
    from ..operators.rollup import ROLLUP_KEY, SUB_KEY

    cur = _resolve_store(rollup_dir)
    if cur is None:
        return
    entries = sorted(e for e in os.listdir(cur)
                     if not e.startswith((".", "_")))
    if not entries:
        return
    needed = [*ROLLUP_KEY, SUB_KEY, "Bytes", "Packets", "Count"]
    epochs = [e for e in entries if e.startswith("epoch=")]
    # pin the input to COMPLETE epochs (job-commit _SUCCESS marker): an
    # epoch whose commit is in flight at snapshot time has a PARTIALLY
    # visible file set — merging the visible half while salvage_known
    # skipped the late files lost them with no crash at all (round-7
    # review, second pass). An incomplete epoch stays out of the
    # snapshot AND out of salvage_known, so the swap's file-level
    # salvage carries whatever it has landed by publish time; its
    # writer's own commit then either completes into the still-visible
    # previous version (and re-lands via the appender's pointer check)
    # or fails visibly and replays (epoch overwrite is idempotent
    # either way).
    # epoch=-1 is compaction's OWN output, published atomically by the
    # pointer flip — it never carries an inner _SUCCESS (the partitioned
    # write leaves the marker at the version-dir root), so gating it
    # would exclude it from every future merge: each compaction would
    # then only salvage-copy the ever-growing epoch=-1 history instead
    # of re-merging it (round-7 review of the gate itself).
    epochs = [e for e in epochs
              if e == "epoch=-1"
              or os.path.exists(os.path.join(cur, e, "_SUCCESS"))]
    flat = [e for e in entries if not e.startswith("epoch=")]
    snapshot = set(flat) | set(epochs)
    if not snapshot:
        return
    parts = []
    for group in (epochs, flat):
        if group:
            parts.append(
                spark.read.option("basePath", cur)
                .parquet(*[os.path.join(cur, e) for e in group])
                .select(*needed))
    src = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    compacted = compact_rollup(src)
    # O3 — the table's physical clustering order (create.sh:90 composite
    # sort key): sortWithinPartitions writes each file in key order, so
    # parquet row-group min/max stats give the range-scan behavior of the
    # MergeTree primary key with zero extra shuffle (sort is per-task).
    _swap_in(rollup_dir, lambda new: (
        compacted.withColumn("epoch", F.lit(-1))
        .sortWithinPartitions("Timeslot", "SrcAS", "DstAS")
        .write.mode("overwrite").partitionBy("epoch", "Date")
        .parquet(new)), salvage_known=snapshot)


def read_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """Reader view of the rollup: always re-aggregates, so stored partials
    are indistinguishable from merged rows (ClickHouse readers must do the
    same, README.md:164-173). Resolves the store pointer, so the read is
    one consistent snapshot regardless of concurrent compaction."""
    return compact_rollup(
        spark.read.parquet(_resolve_store(rollup_dir) or rollup_dir))


def start_jdbc_inserter(flows_stream: DataFrame, jdbc_url: str, table: str,
                        checkpoint_dir: str, *,
                        properties: dict | None = None,
                        trigger: dict | None = None) -> StreamingQuery:
    """S7/W1 — the Go inserter (inserter/inserter.go:90-196) as
    foreachBatch JDBC append: 14-column projection (inserter.go:51-66,
    142-157), Go-style IP text render, 5-s trigger ≈ flush.dur.

    Delivery: at-least-once (a crash between the JDBC append and the
    checkpoint commit re-runs the epoch). For exactly-once use
    :func:`start_transactional_inserter` — same projection, plus the
    batch-id ledger (SURVEY W2). Requires a JDBC driver on the classpath;
    the projection itself is unit-tested without one.
    """
    projected = inserter_projection(flows_stream)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.write.mode("append")
         .jdbc(jdbc_url, table, properties=properties or {}))

    return _start_foreach_batch(projected, write_batch, checkpoint_dir,
                                output_mode="append",
                                trigger=trigger)


def _dbapi(con):
    """(cursor-like, placeholder) for a DB-API connection. DuckDB exposes
    ``execute``/``executemany`` on the CONNECTION and uses qmark ``?``
    placeholders; psycopg2/pg8000 (the documented Postgres forms) need a
    cursor and use format-style ``%s`` — round-6 review caught the
    writers below crashing on both differences under the documented
    psycopg2 usage. The paramstyle comes from the driver module's own
    DB-API ``paramstyle`` attribute (falling back to qmark).

    Prefer ``con.cursor()`` whenever it exists (round-7 review: the old
    has-executemany heuristic misrouted sqlite3, whose CONNECTION has
    executemany shortcuts but no fetchone — every standard driver's
    cursor carries the full execute/fetch surface, and DuckDB's
    cursor() is a sibling connection to the same database, equally
    transactional)."""
    import sys
    cur = con.cursor() if hasattr(con, "cursor") else con
    root = type(con).__module__.split(".")[0]
    style = getattr(sys.modules.get(root, None), "paramstyle", "qmark")
    return cur, ("?" if style == "qmark" else "%s")


def exactly_once_batch_writer(con_factory, table: str, *,
                              ledger_table: str | None = None):
    """W2 — exactly-once foreachBatch writer over any DB-API connection
    (duckdb here, psycopg2/pg8000 against the reference's Postgres).

    The reference marks offsets BEFORE flushing (inserter.go:176-196,
    SURVEY W2) and can lose the tail; plain ``foreachBatch`` + append can
    instead DUPLICATE an epoch (crash after the insert, before the
    checkpoint commit → Spark re-runs the batch). This writer closes both
    holes with a batch-id ledger, one transaction per epoch:

        BEGIN;
        ledger has batch_id?      -> COMMIT (already delivered: skip)
        DELETE target WHERE batch_id  (clean any non-txn partial attempt)
        INSERT rows (batch_id stamped on every row)
        INSERT ledger(batch_id)
        COMMIT;

    Rows and their ledger mark commit atomically, so every epoch lands
    exactly once no matter where the stream crashes.

    LEDGER IDENTITY CONTRACT (all three writer variants): the ledger
    key is the bare micro-batch id, so it is exactly-once only while
    batch ids identify the same data — true within one checkpoint
    lineage, and across a checkpoint WIPE only when the source replays
    the same epochs deterministically (a file source does; the tested
    wipe-redelivery property). It is NOT safe to (a) point a stream at
    non-replayable offsets (Kafka ``latest`` after a wipe, expired
    retention) — restarted batch ids then carry NEW data the ledger
    silently skips — or (b) share one ledger table between two streams:
    give each stream its own ``ledger_table`` and truncate it when
    intentionally re-pointing a source.

    Scale note: a DB-API insert materializes the micro-batch on the
    driver — the Go inserter's own model (100-row INSERT batches,
    inserter.go:90-113), right for the dashboard-rate stream this mirrors.
    For bulk backfills use :func:`exactly_once_staged_writer` — the
    distributed form (executors stage, the driver txn does
    ``INSERT .. SELECT`` from staging) with the identical ledger
    contract; this writer is its small-batch special case.
    """
    ledger = ledger_table or f"{table}_epoch_ledger"

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        con = con_factory()
        cur, ph = _dbapi(con)
        try:
            cur.execute("BEGIN")
            cur.execute(
                f"CREATE TABLE IF NOT EXISTS {ledger} "
                f"(batch_id BIGINT PRIMARY KEY, committed_at TIMESTAMP)")
            cur.execute(
                f"SELECT count(*) FROM {ledger} WHERE batch_id = {ph}",
                [batch_id])
            if cur.fetchone()[0]:
                cur.execute("COMMIT")
                return
            # materialize the batch only AFTER the replay check — a
            # replayed committed epoch triggers no Spark job at all
            # (the staged/JDBC siblings' pre-check device). collect()
            # Rows, NOT toPandas (round-7 review): pandas turns a
            # nullable int64 column into float64 with NaN, so one null
            # SrcAS made executemany feed NaN into a BIGINT and
            # crash-loop the epoch; Row tuples keep exact ints and None.
            batch_cols = batch_df.columns
            cols = ", ".join(batch_cols + ["batch_id"])
            marks = ", ".join([ph] * (len(batch_cols) + 1))
            cur.execute(f"DELETE FROM {table} WHERE batch_id = {ph}",
                        [batch_id])
            rows = [tuple(r) + (batch_id,) for r in batch_df.collect()]
            if rows:
                cur.executemany(
                    f"INSERT INTO {table} ({cols}) VALUES ({marks})", rows)
            cur.execute(
                f"INSERT INTO {ledger} VALUES ({ph}, current_timestamp)",
                [batch_id])
            cur.execute("COMMIT")
        except Exception:
            try:
                cur.execute("ROLLBACK")
            except Exception:
                pass
            raise
        finally:
            con.close()

    return write_batch


def exactly_once_staged_writer(con_factory, table: str, stage_dir: str, *,
                               ledger_table: str | None = None):
    """W2, distributed form — the staged variant
    :func:`exactly_once_batch_writer` describes: executors write each
    micro-batch to a per-epoch staging location with a fully DISTRIBUTED
    ``df.write`` (no driver-side materialization, no row ever passes
    through the driver), then one driver-side transaction performs the
    ledger check + ``INSERT .. SELECT`` from staging + ledger mark — the
    same atomic contract, now sized for bulk backfills where a
    ``toPandas`` micro-batch would not fit driver memory:

        executors:  batch_df.write.mode("overwrite") -> stage/epoch=N
        driver txn: BEGIN;
                    ledger has N?          -> COMMIT (skip replay)
                    DELETE target WHERE batch_id = N   (partial attempts)
                    INSERT INTO target SELECT *, N FROM <stage epoch=N>
                    INSERT ledger(N); COMMIT

    The staging write itself is idempotent (mode("overwrite") per epoch
    directory), and staging is cleaned only AFTER the commit — a crash at
    any point either replays into an overwrite or hits the ledger skip.

    Staging transport here is parquet + DuckDB ``read_parquet`` (the
    database ingests the staged files server-side — no per-row driver
    loop anywhere). Against the reference's Postgres the identical
    contract is ``df.write.jdbc`` into a per-epoch staging TABLE and
    ``INSERT .. SELECT`` from it inside the same ledger transaction —
    that literal form is :func:`exactly_once_staged_jdbc_writer`. The
    driver-side :func:`exactly_once_batch_writer` remains the
    small-batch special case (dashboard-rate streams, where one extra
    fsync per 100 rows beats a distributed write's task overhead).

    SHARED-FILESYSTEM REQUIREMENT: ``stage_dir`` must be visible to both
    the executors (which write it) and this driver-side committer (which
    globs and ingests it) — on a multi-node cluster that means shared
    storage (HDFS/NFS/object store via a mounted path), exactly like a
    checkpoint location. A local-disk stage_dir on a real cluster would
    stage on each executor's disk and glob nothing on the driver; the
    guard below turns that misconfiguration (and any partial stage) into
    a raised error BEFORE the ledger mark, never a silently-empty commit
    that exactly-once would then pin forever.
    """
    import glob
    import shutil

    ledger = ledger_table or f"{table}_epoch_ledger"

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        cols = list(batch_df.columns)
        epoch_dir = os.path.join(stage_dir, f"epoch={batch_id}")
        # cheap replay pre-check BEFORE any Spark work (the JDBC
        # sibling's device, round-6 review): a replayed committed epoch
        # triggers neither isEmpty nor the distributed staging write —
        # it only clears the crashed attempt's leftover staging
        con = con_factory()
        cur, ph = _dbapi(con)
        try:
            cur.execute("BEGIN")
            cur.execute(
                f"CREATE TABLE IF NOT EXISTS {ledger} "
                f"(batch_id BIGINT PRIMARY KEY, committed_at TIMESTAMP)")
            cur.execute(
                f"SELECT count(*) FROM {ledger} WHERE batch_id = {ph}",
                [batch_id])
            already = cur.fetchone()[0] > 0
            cur.execute("COMMIT")
        finally:
            con.close()
        if already:
            shutil.rmtree(epoch_dir, ignore_errors=True)
            return

        # independent EXPECTED count from the Spark side (round-7
        # review): counting only the VISIBLE staged parts would pass a
        # PARTIALLY visible stage (driver-local parts present, remote
        # executors' parts not) — committing a subset the ledger then
        # pins forever. The count rides the staging write itself via an
        # Observation (CollectMetrics over the rows the write job
        # actually processed) — the same authoritative yardstick the
        # old separate batch_df.count() job gave, without re-running
        # the micro-batch pipeline a second time per epoch.
        from pyspark.sql import Observation
        obs = Observation()
        (batch_df.observe(obs, F.count(F.lit(1)).alias("n"))
         .write.mode("overwrite").parquet(epoch_dir))
        expected = obs.get["n"]
        parts = glob.glob(os.path.join(epoch_dir, "*.parquet"))
        if expected and not parts:
            raise RuntimeError(
                f"staged epoch {batch_id} is non-empty but no parquet "
                f"parts are visible at {epoch_dir} — stage_dir must be "
                f"on storage shared between executors and the driver "
                f"(see exactly_once_staged_writer docstring); refusing "
                f"to mark the ledger and silently drop the batch")
        con = con_factory()
        cur, ph = _dbapi(con)
        try:
            cur.execute("BEGIN")
            cur.execute(
                f"SELECT count(*) FROM {ledger} WHERE batch_id = {ph}",
                [batch_id])
            seen = cur.fetchone()[0]
            if seen:
                cur.execute("COMMIT")   # replay: skip, but still clean
            else:
                cur.execute(f"DELETE FROM {table} WHERE batch_id = {ph}",
                            [batch_id])
                if parts:  # an empty epoch still gets its ledger mark
                    collist = ", ".join(cols)
                    # file list inlined: DuckDB table-function args can't
                    # be prepared-statement parameters
                    files_sql = "[" + ", ".join(
                        "'" + p.replace("'", "''") + "'"
                        for p in parts) + "]"
                    cur.execute(
                        f"SELECT count(*) FROM read_parquet({files_sql})")
                    staged = cur.fetchone()[0]
                    if staged != expected:
                        raise RuntimeError(
                            f"epoch {batch_id}: batch has {expected} "
                            f"rows but the visible staged parts hold "
                            f"{staged} — a PARTIALLY visible stage "
                            f"(non-shared stage_dir?); aborting before "
                            f"the ledger mark (txn rolls back)")
                    cur.execute(
                        f"INSERT INTO {table} ({collist}, batch_id) "
                        f"SELECT {collist}, {ph} "
                        f"FROM read_parquet({files_sql})",
                        [batch_id])
                    # DuckDB returns the insert count as a result row;
                    # cursor-style drivers report it via rowcount
                    try:
                        row = cur.fetchone()
                        inserted = row[0] if row else cur.rowcount
                    except Exception:
                        inserted = cur.rowcount
                    if inserted != staged:
                        raise RuntimeError(
                            f"epoch {batch_id}: staged {staged} rows but "
                            f"inserted {inserted} — aborting before the "
                            f"ledger mark (txn rolls back)")
                cur.execute(
                    f"INSERT INTO {ledger} VALUES ({ph}, "
                    f"current_timestamp)", [batch_id])
                cur.execute("COMMIT")
        except Exception:
            try:
                cur.execute("ROLLBACK")
            except Exception:
                pass
            raise
        finally:
            con.close()
        shutil.rmtree(epoch_dir, ignore_errors=True)

    return write_batch


def _jdbc_table_exists_error(e: Exception) -> bool:
    """Locale-proof duplicate-table detection for the ledger DDL:
    SQLState X0Y32 (Derby) / 42P07 (PostgreSQL and ANSI-compliant
    dialects) read from the underlying java.sql.SQLException chain,
    with the English-substring test only as a fallback for drivers
    that bury the state (round-7 review: a Postgres server with
    lc_messages=de_DE says "existiert bereits" — the substring test
    re-raised and killed every restart after the first)."""
    je = getattr(e, "java_exception", None)
    for _ in range(8):              # bounded cause-chain walk
        if je is None:
            break
        try:
            if je.getSQLState() in ("X0Y32", "42P07"):
                return True
        except Exception:
            pass
        try:
            je = je.getCause()
        except Exception:
            break
    s = str(e)
    return "X0Y32" in s or "42P07" in s or "already exists" in s


def exactly_once_staged_jdbc_writer(jdbc_url: str, table: str, *,
                                    ledger_table: str | None = None,
                                    driver: str | None = None,
                                    stage_table: str | None = None,
                                    create_table_column_types: str | None
                                    = None):
    """W2, distributed form over a REAL JDBC target — the literal shape
    of the reference's Postgres path (inserter.go:95-106: COPY into the
    table inside a transaction): executors bulk-write each micro-batch
    into a staging TABLE with a fully distributed ``df.write.jdbc``
    (each task opens its own connection to the database — no shared
    filesystem required, no row through the driver), then one driver
    transaction performs the identical ledger contract as
    :func:`exactly_once_staged_writer`:

        executors:  batch_df.write.jdbc(url, <stage>, overwrite)
        driver txn: ledger has N? -> COMMIT (skip replay)
                    DELETE target WHERE batch_id = N
                    INSERT INTO target SELECT *, N FROM <stage>
                    INSERT ledger(N); COMMIT

    The staging write is idempotent (``mode("overwrite")`` recreates the
    stage table per attempt), and the same staged-vs-inserted row-count
    guard aborts BEFORE the ledger mark on any mismatch. A replayed
    epoch is detected by a cheap ledger SELECT *before* the staging
    write, so replay skips the full distributed stage entirely (and
    drops any leftover stage table from the crashed attempt) — the
    in-transaction ledger re-check stays as the authoritative gate.
    The driver-side transaction runs over ``java.sql`` through the live
    SparkSession's JVM gateway, so one code path serves embedded Derby
    (in-repo e2e test — the jar ships with Spark) and a networked
    Postgres (swap the URL + driver class; the SQL is ANSI).

    The stage table name defaults to ``{table}_stage`` and is a POINT OF
    CONTENTION: two concurrent streams targeting the same table MUST
    pass distinct ``stage_table`` names (e.g. suffixed with the query
    name), or their overwrites will clobber each other's staged rows.

    ``create_table_column_types`` passes through to the Spark JDBC
    writer's option of the same name (e.g. ``"src_ip VARCHAR(64)"``) —
    dialects that map StringType to CLOB/TEXT (Derby does) may need it
    so stage-column types match the target's. Identifiers are quoted
    exactly as the Spark JDBC writer quotes them, so column-name case
    survives case-folding dialects.
    """
    ledger = ledger_table or f"{table}_epoch_ledger"
    stage = stage_table or f"{table}_stage"

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        cols = list(batch_df.columns)
        spark = batch_df.sparkSession
        jvm = spark._sc._jvm
        if driver:
            jvm.java.lang.Class.forName(driver)
        conn = jvm.java.sql.DriverManager.getConnection(jdbc_url)
        try:
            # ledger DDL runs in its OWN auto-committed statement BEFORE
            # the ledger transaction opens: PostgreSQL aborts the whole
            # transaction on any failed statement (a swallowed
            # "already exists" would poison every subsequent statement
            # with "current transaction is aborted"), while Derby aborts
            # only the statement — creating it outside the txn is the
            # dialect-safe form for both
            st0 = conn.createStatement()
            try:
                st0.executeUpdate(
                    f'CREATE TABLE {ledger} ("batch_id" BIGINT '
                    f'PRIMARY KEY, "committed_at" TIMESTAMP)')
            except Exception as e:  # no IF NOT EXISTS in Derby
                if not _jdbc_table_exists_error(e):
                    raise
            finally:
                st0.close()
            # cheap pre-check BEFORE the distributed staging write: a
            # replayed epoch skips the full stage rewrite (and clears the
            # crashed attempt's leftover stage table). Advisory only —
            # the in-transaction re-check below stays authoritative.
            st0 = conn.createStatement()
            try:
                rs = st0.executeQuery(
                    f'SELECT count(*) FROM {ledger} '
                    f'WHERE "batch_id" = {int(batch_id)}')
                rs.next()
                already = rs.getLong(1) > 0
                rs.close()
                if already:
                    try:  # stage hygiene from the crashed attempt
                        st0.executeUpdate(f"DROP TABLE {stage}")
                    except Exception:
                        pass
                    return
            finally:
                st0.close()
            # isEmpty() is itself a distributed job over the recovered
            # batch — evaluate it only AFTER the replay pre-check, so a
            # replayed epoch triggers no Spark work at all
            has_rows = not batch_df.isEmpty()
            if has_rows:
                w = (batch_df.write.format("jdbc").mode("overwrite")
                     .option("url", jdbc_url).option("dbtable", stage))
                if driver:
                    w = w.option("driver", driver)
                if create_table_column_types:
                    w = w.option("createTableColumnTypes",
                                 create_table_column_types)
                w.save()
            conn.setAutoCommit(False)
            st = conn.createStatement()

            def one(sql: str) -> int:
                rs = st.executeQuery(sql)
                rs.next()
                v = rs.getLong(1)
                rs.close()
                return v

            seen = one(f'SELECT count(*) FROM {ledger} '
                       f'WHERE "batch_id" = {int(batch_id)}')
            if seen:
                conn.commit()       # replay: ledger says done — skip
                return
            st.executeUpdate(f'DELETE FROM {table} '
                             f'WHERE "batch_id" = {int(batch_id)}')
            if has_rows:
                staged = one(f"SELECT count(*) FROM {stage}")
                if staged == 0:
                    raise RuntimeError(
                        f"epoch {batch_id}: batch is non-empty but the "
                        f"staging table {stage} holds 0 rows — refusing "
                        f"to mark the ledger and drop the batch")
                collist = ", ".join(f'"{c}"' for c in cols)
                inserted = st.executeUpdate(
                    f'INSERT INTO {table} ({collist}, "batch_id") '
                    f"SELECT {collist}, {int(batch_id)} FROM {stage}")
                if inserted != staged:
                    raise RuntimeError(
                        f"epoch {batch_id}: staged {staged} rows but "
                        f"inserted {inserted} — aborting before the "
                        f"ledger mark (txn rolls back)")
            st.executeUpdate(f'INSERT INTO {ledger} VALUES '
                             f"({int(batch_id)}, CURRENT_TIMESTAMP)")
            conn.commit()
            try:                    # post-commit hygiene; replay-safe
                st.executeUpdate(f"DROP TABLE {stage}")
                conn.commit()
            except Exception:
                pass
        except Exception:
            try:
                conn.rollback()
            except Exception:
                pass
            raise
        finally:
            conn.close()

    return write_batch


def start_transactional_inserter(flows_stream: DataFrame, con_factory,
                                 table: str, checkpoint_dir: str, *,
                                 ledger_table: str | None = None,
                                 stage_dir: str | None = None,
                                 jdbc_stage: dict | None = None,
                                 trigger: dict | None = None
                                 ) -> StreamingQuery:
    """S7/W1/W2 — the inserter with exactly-once delivery: the 14-column
    projection through :func:`exactly_once_batch_writer` (default),
    through the distributed :func:`exactly_once_staged_writer` when
    ``stage_dir`` is given (bulk backfills; rows never touch the
    driver), or through :func:`exactly_once_staged_jdbc_writer` when
    ``jdbc_stage`` is given (kwargs for that writer, ``url`` required —
    staging goes into a database TABLE via ``df.write.jdbc``, the
    literal Postgres shape; ``con_factory`` is unused on this path).
    ``con_factory`` returns a fresh DB-API connection per epoch
    (duckdb.connect(path) in tests; psycopg2.connect(dsn) against the
    reference's Postgres). The target table needs the 14 projection
    columns plus ``batch_id BIGINT``.
    """
    projected = inserter_projection(flows_stream)
    if jdbc_stage is not None:
        opts = dict(jdbc_stage)
        batch_writer = exactly_once_staged_jdbc_writer(
            opts.pop("url"), table, ledger_table=ledger_table, **opts)
    elif stage_dir is not None:
        batch_writer = exactly_once_staged_writer(
            con_factory, table, stage_dir, ledger_table=ledger_table)
    else:
        batch_writer = exactly_once_batch_writer(
            con_factory, table, ledger_table=ledger_table)
    return _start_foreach_batch(projected, batch_writer, checkpoint_dir,
                                output_mode="append",
                                trigger=trigger)


def inserter_projection(flows: DataFrame) -> DataFrame:
    """The inserter's 14-field tuple (inserter.go:142-157): epoch→timestamp,
    Go net.IP.String() rendering with nil→"0.0.0.0" (inserter.go:131-140),
    NOW() as a real current_timestamp (the reference binds the string
    "NOW()" as a parameter — SURVEY §3.2 notes we fix that).

    Accepts either the wire-decoded frame (TimeFlowStart as epoch seconds,
    the inserter's actual input) or the flows_raw MV output (already a
    timestamp) — the projection is the same 14 columns either way."""
    from ..functions.ip import go_ip_to_string

    tf_type = dict(flows.dtypes).get("TimeFlowStart", "bigint")
    time_flow = (F.col("TimeFlowStart") if tf_type.startswith("timestamp")
                 else F.timestamp_seconds("TimeFlowStart"))
    return flows.select(
        F.current_timestamp().alias("date_inserted"),
        time_flow.alias("time_flow"),
        F.col("Type").alias("type"),
        F.col("SamplingRate").cast("int").alias("sampling_rate"),
        F.coalesce(go_ip_to_string(F.col("SrcAddr")), F.lit("0.0.0.0")).alias("src_ip"),
        F.coalesce(go_ip_to_string(F.col("DstAddr")), F.lit("0.0.0.0")).alias("dst_ip"),
        F.col("Bytes").alias("bytes"),
        F.col("Packets").alias("packets"),
        F.col("SrcPort").alias("src_port"),
        F.col("DstPort").alias("dst_port"),
        F.col("Etype").alias("etype"),
        F.col("Proto").alias("proto"),
        F.col("SrcAS").cast("long").alias("src_as"),
        F.col("DstAS").cast("long").alias("dst_as"),
    )


def start_dedup_stream(flows_raw_stream: DataFrame, out_dir: str,
                       checkpoint_dir: str, *,
                       key_cols: list[str] | None = None,
                       lateness: str = "10 minutes",
                       trigger: dict | None = None) -> StreamingQuery:
    """Streaming exact dedup — duplicate flow-export suppression.

    Routers resend NetFlow/IPFIX export packets on timeout, and collector
    restarts can replay deliveries; the reference pipeline inserts such
    duplicates verbatim (its Kafka→ClickHouse path has no dedup stage).
    This job drops re-deliveries using ``dropDuplicatesWithinWatermark``:
    state holds only keys newer than the event-time watermark, so memory
    is bounded by (key rate × lateness), not stream age. A duplicate
    arriving later than ``lateness`` passes through (at-least-once dedup;
    exact within the horizon).

    Key choice: the default is EXPORTER-SIDE record identity —
    ``SamplerAddress`` + the flow's own timestamps (``TimeFlowStart`` /
    ``TimeFlowEnd``) + 5-tuple + counters. A router-resent export packet
    carries the same flow records verbatim, but the collector stamps the
    resend with a FRESH ``TimeReceived`` — so keys that include
    ``TimeReceived`` (or the collector-side ``SequenceNum``, which
    identifies the EXPORT PACKET and changes on resend) only ever catch
    broker-level re-deliveries, not the router resends this job exists
    for. Counters (``Bytes``/``Packets``) are included so two genuinely
    distinct same-second flows between the same endpoints don't collide;
    a resend repeats the counters verbatim, so it still dedups. Pass
    ``key_cols=["SamplerAddress", "SequenceNum", "TimeReceived", ...]``
    explicitly to narrow to broker-redelivery-only suppression.

    Scale: state is hashed across executors by key — no hot spots unless
    one exporter dominates; RocksDB state store for large key spaces.
    """
    keys = key_cols or ["SamplerAddress", "TimeFlowStart", "TimeFlowEnd",
                        "SrcAddr", "DstAddr", "SrcPort", "DstPort", "Proto",
                        "Bytes", "Packets"]
    deduped = (
        flows_raw_stream
        .withWatermark("TimeReceived", lateness)
        .dropDuplicatesWithinWatermark(keys)
    )
    return _start_file_sink(deduped, out_dir, checkpoint_dir,
                            partition_by="Date", trigger=trigger)


def start_session_stream(events_stream: DataFrame, out_dir: str,
                         checkpoint_dir: str, *,
                         gap: str = "30 minutes",
                         lateness: str = "1 hour",
                         ts_col: str = "ts", key_col: str = "user_id",
                         trigger: dict | None = None) -> StreamingQuery:
    """W8 — streaming sessionization via Spark-native ``session_window``.

    The batch form (plans/queries.py:user_sessions — lag + cumulative sum)
    needs the whole history per key; this is the unbounded-stream version:
    state per key is only the OPEN session (merged start/end + running
    aggregates), emitted once when the watermark passes ``gap`` past its
    last event. Two events join one session iff their gap-extended windows
    overlap (next.ts − prev.ts < gap).

    Scale: one shuffle on the session key per micro-batch; state size is
    |active keys|, independent of stream age or session length.
    """
    sessions = (
        events_stream
        .withWatermark(ts_col, lateness)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"),
                 F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(key_col,
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events")
    )
    return _start_file_sink(sessions, out_dir, checkpoint_dir,
                            trigger=trigger)


def start_rollup_stream_watermarked(flows_raw_stream: DataFrame,
                                    rollup_dir: str, checkpoint_dir: str, *,
                                    lateness: str = "1 hour",
                                    trigger: dict | None = None
                                    ) -> StreamingQuery:
    """W4/W5 — the canonical Spark alternative to the stateless-partials
    rollup: a watermarked 5-minute windowed aggregation in append mode.

    Trade-off vs ``start_rollup_stream`` (the SummingMergeTree model):
    here state is BOUNDED (windows newer than the watermark) and each
    window row is written exactly once, already merged — no compaction
    needed — but rows later than ``lateness`` are dropped. The reference
    tolerates unbounded lateness at the price of partial rows + OPTIMIZE;
    we ship both designs, same output schema (flat rollup form), so a
    deployment picks per workload.

    Scale: state ≈ |open windows| × |AS-pair × EType keys| rows in the
    state store; the watermark bounds |open windows| regardless of stream
    age. RocksDB state store lifts the per-executor memory cap.
    """
    from ..functions.timeutil import to_start_of_five_minute  # noqa: F401
    from ..operators.rollup import SUB_KEY

    agg = (
        flows_raw_stream
        .withWatermark("TimeReceived", lateness)
        .groupBy(
            F.window("TimeReceived", "5 minutes").alias("w"),
            F.col("SrcAS"), F.col("DstAS"),
            F.col("Etype").alias(SUB_KEY),
        )
        .agg(F.sum("Bytes").alias("Bytes"),
             F.sum("Packets").alias("Packets"),
             F.count(F.lit(1)).alias("Count"))
        .select(
            F.to_date(F.col("w.start")).alias("Date"),
            F.col("w.start").alias("Timeslot"),
            "SrcAS", "DstAS", SUB_KEY, "Bytes", "Packets", "Count",
        )
    )
    return _start_file_sink(agg, rollup_dir, checkpoint_dir,
                            partition_by="Date", trigger=trigger)


def start_drift_monitor_stream(docs_stream: DataFrame,
                               ref_counts: DataFrame, bin_col,
                               n_bins: int, out_dir: str,
                               checkpoint_dir: str, *,
                               trigger: dict | None = None
                               ) -> StreamingQuery:
    """Continuous drift monitoring — the streaming form of
    :func:`~..operators.profile.psi_drift`: every micro-batch bins under
    the SHARED binning (``bin_col`` must be the same expression that
    built ``ref_counts`` via ``bin_histogram`` — persisted once from
    the accepted reference snapshot) and scores its PSI against the
    stored reference histogram; one (batch_id, n_docs, psi_e6) row
    appends per epoch, the table a dashboard alerts on (psi_e6/1e6 >
    0.25 = the crawl shifted — new source mix, changed scraper,
    encoding bug — BEFORE the bad batch pollutes the corpus).

    Per-epoch directories with overwrite keep the sink idempotent on
    replay (the staged-writer contract); readers see an ``epoch``
    partition column. Scale: per batch, one n_bins-bounded aggregate +
    the broadcast-sized reference join — the monitor's cost is
    independent of corpus history.

    ``ref_counts`` is accepted in either column spelling: raw
    ``bin_histogram`` output (bin, c) — the docstring-recommended
    artifact, which previously CRASHED with an unresolved ``c_ref``
    (round-7 review) — or the pre-renamed (bin, c_ref) form. The
    current batch bins through the SAME ``bin_histogram`` operator the
    reference was built with, so the two sides cannot drift apart."""
    from ..operators.profile import bin_histogram, psi_from_counts

    ref = (ref_counts.withColumnRenamed("c", "c_ref")
           if "c_ref" not in ref_counts.columns else ref_counts)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        cur = (bin_histogram(batch_df, bin_col)
               .withColumnRenamed("c", "c_cur"))
        rows = (psi_from_counts(ref, cur, n_bins)
                .agg(F.max("psi_e6").alias("psi_e6"),
                     F.sum("c_cur").alias("n_docs")).first())
        spark = batch_df.sparkSession
        (spark.createDataFrame(
            [(int(batch_id), int(rows["n_docs"] or 0),
              int(rows["psi_e6"] or 0))],
            "batch_id long, n_docs long, psi_e6 long")
         .write.mode("overwrite")
         .parquet(os.path.join(out_dir, f"epoch={batch_id}")))

    return _start_foreach_batch(docs_stream, write_batch, checkpoint_dir,
                                output_mode="append",
                                trigger=trigger)


def start_document_qc_stream(docs_stream: DataFrame, out_dir: str,
                             checkpoint_dir: str, *,
                             min_tokens: int = 5,
                             dedup_horizon: str = "10 minutes",
                             history: DataFrame | None = None,
                             history_bloom: tuple | None = None,
                             semantic_store: DataFrame | None = None,
                             semantic_centroids: list | None = None,
                             semantic_threshold: float = 0.999,
                             semantic_driver_max_store_rows: int = 100_000,
                             span_scrub_k: int | None = None,
                             trigger: dict | None = None) -> StreamingQuery:
    """Continuous corpus curation — the training-data analog of the flows
    MV cascade: a document stream (crawl batches landing continuously)
    flows through the same gates as the batch `corpus_curation` /
    `curation_full_pipeline` queries, as ONE streaming query.

    Per micro-batch: PII scrub → length gate → model-scored quality gate
    (classifier margin >= 0) → exact dedup on the content digest within a
    processing-time watermark horizon → curated parquet append,
    partitioned by source.

    Order matters at scale exactly as in the batch pipeline: every
    per-row gate runs BEFORE the dedup's digest shuffle, so a document
    crosses the wire at most once, post-filter — and the dedup state
    store holds 32-byte digests, not documents, bounded by the watermark
    horizon (dropDuplicatesWithinWatermark evicts state older than the
    horizon). Pass ``history`` (the already-curated corpus, or directly
    its stored digest table with a ``content_hash`` column) to ALSO drop
    documents the corpus already contains: a stream-static anti-join
    (left_outer + null filter — the stream-static-supported form),
    re-resolved per micro-batch like the enrichment MV's dimension, so a
    nightly-refreshed digest store is picked up without restarting the
    stream. Watermark state stays bounded either way — history lives in
    the static table, not the state store (the batch
    `incremental_dedup` is the same contract, one batch at a time).
    ``history_bloom`` (a ``bloom_build`` artifact) is the bounded-memory
    alternative: the bitmap broadcasts once and each micro-batch pays a
    per-row probe instead of the stream-static join — no false
    negatives, ~fpp fresh docs over-dropped (the Dolma trade); it
    composes with ``history`` (exact store for the hot window, Bloom
    for deep history).

    Pass ``semantic_store`` (the (id, cell, embedding) artifact from
    ``operators.similarity.semantic_store``) + ``semantic_centroids``
    (the centroid set that built it) to ALSO drop documents that are
    SEMANTIC near-duplicates of the curated corpus — re-crawls with a
    changed tail or byline that the digest anti-join cannot catch. Each
    document embeds via the hashed-TF Arrow kernel (the real-encoder
    swap point) and assigns its cell against the broadcast centroid
    literal; the verify then takes one of two forms, switched on the
    store's size:

    - store ≤ ``semantic_driver_max_store_rows``: map-side pandas-UDF
      gate (``semantic_gate_udf`` — the store collects once at stream
      start, grouped by cell; batch-identical cosine operand order).
      Zero per-batch join cost; right for dashboard-rate streams over a
      bounded curated store.
    - store > threshold: fully DISTRIBUTED verify — the store never
      touches the driver. The batch operator's HOF arithmetic
      (``incremental_semantic_dedup``, raw dot / norm product, HALF-UP
      4dp) runs as a stream-static LEFT OUTER equi-join on ``cell``
      with the cosine threshold in the join condition, followed by the
      null filter — the stream-static-supported anti-join form this
      module already uses for the digest history. A surviving document
      matches NO store row, so it exits the join exactly once (no row
      multiplication), which keeps the single streaming plan, the
      watermark dedup, and the file sink's exactly-once intact — no
      foreachBatch epoch-directory fallback needed. Per micro-batch the
      store side shuffles (or partition-prunes, when persisted
      partitioned by cell) only the probed cells' rows.

    Pass ``span_scrub_k`` to ALSO run the ExactSubstr span stage
    (operators/dedup.py repeated_span_table + remove_repeated_spans,
    the Lee et al. 2022 pass the batch ``curation_full_pipeline``
    composes) over each micro-batch: cross-document repeated ≥k-token
    spans WITHIN the batch are scrubbed (boilerplate/license blocks a
    crawl batch shares), documents falling under ``min_tokens`` after
    scrubbing are dropped, and the batch writes to a per-epoch
    directory. Scope is deliberately batch-local — the span table is a
    corpus-wide aggregate, so cross-batch span state belongs to the
    periodic BATCH ExactSubstr pass over the accumulated corpus, not to
    stream state (same division of labor as compaction vs the rollup
    stream). Because the span stage needs its own aggregation after the
    stateful dedup, this path sinks via foreachBatch writing
    ``out_dir/epoch=N`` with overwrite (idempotent on replay — the same
    exactly-once contract, epoch-granular); readers see an extra
    ``epoch`` partition column.

    Delivery: checkpointed file sink — exactly-once per batch id; a
    replayed micro-batch rewrites the same files.
    """
    from ..operators.text import (classifier_z_e4, normalize_text,
                                  scrub_pii, token_count)

    scrubbed = docs_stream.withColumn("text", scrub_pii(F.col("text")))
    gated = (
        scrubbed
        .withColumn("n_tokens", token_count(F.col("text")))
        .withColumn("score_e4", classifier_z_e4(F.col("text")))
        .filter((F.col("n_tokens") >= min_tokens)
                & (F.col("score_e4") >= 0))
        .withColumn("content_hash", F.md5(normalize_text(F.col("text"))))
        .withColumn("ingest_ts", F.current_timestamp())
    )
    if history is not None:
        hist = (history if "content_hash" in history.columns
                else history.select(
                    F.md5(normalize_text(F.col("text")))
                    .alias("content_hash")))
        hist = (hist.select("content_hash").distinct()
                .withColumn("_in_history", F.lit(True)))
        gated = (gated.join(hist, "content_hash", "left_outer")
                 .filter(F.col("_in_history").isNull())
                 .drop("_in_history"))
    if history_bloom is not None:
        # Bloom form of the history gate (the Dolma store,
        # operators/dedup.py:bloom_build): the bitmap broadcasts in the
        # UDF closure, so the per-micro-batch cost is a per-row probe —
        # no stream-static join at all. One-sided like the batch form:
        # every true replay drops; ~fpp fresh docs over-drop. Composes
        # WITH the exact `history` gate (exact store for the recent
        # hot window, Bloom for deep history) or replaces it.
        from ..operators.dedup import bloom_seen_udf
        _seen = bloom_seen_udf(history_bloom)
        gated = gated.filter(~_seen(F.col("content_hash")))
    if semantic_store is not None:
        from ..operators.similarity import (_cos_pre, _norm,
                                            assign_nearest_centroid,
                                            hashed_tf_embed,
                                            semantic_gate_udf)
        if semantic_centroids is None:
            raise ValueError("semantic_store requires the centroid set "
                             "that built it (assignments are only "
                             "comparable within one centroid set)")
        gated = hashed_tf_embed(gated, text_col="text")
        gated = assign_nearest_centroid(gated, semantic_centroids)
        if semantic_store.count() <= semantic_driver_max_store_rows:
            _sem_dup = semantic_gate_udf(semantic_store,
                                         semantic_threshold)
            gated = gated.filter(~_sem_dup(F.col("embedding"),
                                           F.col("cell")))
        else:
            # distributed verify: the incremental_semantic_dedup HOF
            # arithmetic as a stream-static left-outer + null-filter
            # anti-join — the store never collects to the driver
            h = (semantic_store
                 .select(F.col("cell").alias("_hcell"),
                         F.col("embedding").alias("_hv"))
                 .withColumn("_hn", _norm("_hv")))
            gated = gated.withColumn("_nn", _norm("embedding"))
            cond = ((gated["cell"] == h["_hcell"])
                    & (F.round(_cos_pre(gated["embedding"], h["_hv"],
                                        gated["_nn"], h["_hn"]), 4)
                       >= semantic_threshold))
            gated = (gated.join(h, cond, "left_outer")
                     .filter(h["_hcell"].isNull())
                     .drop("_hcell", "_hv", "_hn", "_nn"))
        gated = gated.drop("embedding", "cell")
    deduped = (gated
               .withWatermark("ingest_ts", dedup_horizon)
               .dropDuplicatesWithinWatermark(["content_hash"]))
    sink_df = deduped.drop("ingest_ts", "score_e4")
    if span_scrub_k is not None:
        from ..operators.dedup import (remove_repeated_spans,
                                       repeated_span_table)
        k = span_scrub_k

        def write_scrubbed(batch_df: DataFrame, batch_id: int) -> None:
            # The micro-batch feeds THREE branches (span fingerprints,
            # the scrub join's doc side, and the metadata join-back) —
            # foreachBatch hands over a plan, not materialized rows, so
            # without a persist the whole gate pipeline (PII scrub,
            # classifier, history/semantic gates, watermark dedup state
            # read) re-executes once per branch per epoch. persist +
            # unpersist-in-finally is the bounded per-epoch form of the
            # lazy-localCheckpoint device used in the batch operators.
            batch_df = batch_df.persist()
            try:
                docs = batch_df.select("doc_id", "text")
                spans = repeated_span_table(docs, k=k)
                scrub = remove_repeated_spans(docs, spans)
                out = (batch_df.drop("text", "n_tokens")
                       .join(scrub, "doc_id")
                       .withColumn("n_tokens",
                                   F.when(F.length("text") == 0, F.lit(0))
                                   .otherwise(token_count(F.col("text"))))
                       .filter(F.col("n_tokens") >= min_tokens))
                (out.write.mode("overwrite").partitionBy("source")
                 .parquet(os.path.join(out_dir, f"epoch={batch_id}")))
            finally:
                batch_df.unpersist()

        return _start_foreach_batch(sink_df, write_scrubbed,
                                    checkpoint_dir, output_mode="append",
                                    trigger=trigger)
    return _start_file_sink(sink_df, out_dir, checkpoint_dir,
                            partition_by="source", trigger=trigger)


def start_interval_join_stream(left_stream: DataFrame,
                               right_stream: DataFrame,
                               out_dir: str, checkpoint_dir: str, *,
                               key: str = "user_id",
                               left_ts: str = "ts",
                               right_ts: str = "ts",
                               band: str = "5 minutes",
                               lateness: str = "10 minutes",
                               how: str = "inner",
                               trigger: dict | None = None
                               ) -> StreamingQuery:
    """Stream-STREAM interval join — two live feeds correlated on a key
    within a time band (flows vs an alert/annotation feed; clicks vs
    purchases). The reference pipeline has no two-stream correlation at
    all (each Kafka topic lands in its own table and joins happen at
    query time); this is the Structured Streaming native form: BOTH
    sides watermark, the join condition is key equality plus
    ``right.ts ∈ [left.ts − band, left.ts + band]``, and Spark derives
    the state-eviction horizon from the watermark + band, so per-side
    state is bounded by (rate × (lateness + band)) — never stream age.

    The right side's columns are emitted with an ``r_`` prefix
    (``r_<key>`` is dropped — it equals ``<key>``). ``how="inner"``: a
    row whose partner never arrives inside the band emits nothing, and
    a partner arriving later than ``lateness`` is dropped by the
    watermark (at-least-once within the horizon, the
    start_dedup_stream contract). ``how="left_outer"``: matched rows
    emit immediately; an UNMATCHED left row emits with null r_ columns
    only once the watermark proves no partner can still arrive
    (watermark past ``left.ts + band + lateness``) — the alerting
    shape ("flow with no annotation"), delayed by exactly the horizon.

    Scale: each micro-batch shuffles both sides on the key once; the
    band comparison is a per-row predicate inside the joined state
    store, not a range-join explosion.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(
            f"start_interval_join_stream supports inner/left_outer, "
            f"got {how!r}")
    r_cols = [F.col(c).alias(f"r_{c}") for c in right_stream.columns]
    lw = left_stream.withWatermark(left_ts, lateness)
    rw = (right_stream.select(*r_cols)
          .withWatermark(f"r_{right_ts}", lateness))
    cond = (
        (F.col(key) == F.col(f"r_{key}"))
        & (F.col(f"r_{right_ts}")
           >= F.col(left_ts) - F.expr(f"INTERVAL {band}"))
        & (F.col(f"r_{right_ts}")
           <= F.col(left_ts) + F.expr(f"INTERVAL {band}"))
    )
    joined = lw.join(rw, cond, how).drop(f"r_{key}")
    return _start_file_sink(joined, out_dir, checkpoint_dir,
                            trigger=trigger)


def start_funnel_stream(events_stream: DataFrame, out_dir: str,
                        checkpoint_dir: str, *, steps: list[str],
                        horizon_secs: int | None = None,
                        lateness_secs: int | None = None,
                        trigger: dict | None = None) -> StreamingQuery:
    """Run :func:`flow_pipeline_spark.streaming.stateful.streaming_funnel`
    to a parquet conversion log — one row per (user, stage advance),
    appended live. See streaming_funnel for the two delivery contracts
    (``lateness_secs`` buys cross-batch disorder tolerance via a
    watermark buffer) and the stream ≡ batch guarantee."""
    from .stateful import streaming_funnel

    out = streaming_funnel(events_stream, steps,
                           horizon_secs=horizon_secs,
                           lateness_secs=lateness_secs)
    return _start_file_sink(out, out_dir, checkpoint_dir, trigger=trigger)


def start_cdc_stream(cdc_stream: DataFrame, store_dir: str,
                     checkpoint_dir: str, *, keys: list[str],
                     order_cols: list[str],
                     trigger: dict | None = None) -> StreamingQuery:
    """Continuously-maintained ReplacingMergeTree view — the streaming
    form of ``operators/cdc.py:latest_state``: each micro-batch of
    upserts/deletes merges into a keyed parquet store that always
    holds exactly one row per key (the greatest ``order_cols``
    version). This is what the reference's inserter topology becomes
    when the CH table is a Replacing engine instead of plain MergeTree
    (inserter.go:176-196 appends; the ENGINE dedups on merge — here
    the merge IS the epoch apply).

    Tombstone discipline: the store RETAINS each key's winning row
    even when it is a delete, exactly as ClickHouse keeps the
    ``is_deleted`` row until a final merge — otherwise a
    later-replayed OLDER live row would resurrect the key. The ingest
    loop therefore takes NO tombstone column at all; filtering is a
    READ-side concern — go through ``read_cdc_store(...,
    deleted_col=...)``, which serves only live rows.

    Delivery semantics: epoch replay is IDEMPOTENT by construction —
    re-merging the same rows cannot change a latest-version compaction
    — so this sink needs no ledger for exactly-once state (contrast
    ``exactly_once_batch_writer``, which protects an APPEND-shaped
    sink).

    Scale: per epoch ONE key-partitioned compaction over store+batch
    (WindowGroupLimit keeps sort buffers at one row per key) and a
    store rewrite via atomic directory swap (the run_compaction
    idiom). Store size is |live keys|, not stream age. For TB-scale
    key spaces, partition the store by a key hash and rewrite only the
    partitions the batch touches — noted here, not needed at this
    scale."""
    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        _apply_cdc_batch(batch.sparkSession, store_dir, batch,
                         keys=keys, order_cols=order_cols)

    return _start_foreach_batch(cdc_stream, apply_batch, checkpoint_dir,
                                output_mode="update",
                                trigger=trigger)


def _apply_cdc_batch(spark: SparkSession, store_dir: str, batch: DataFrame,
                     *, keys: list[str], order_cols: list[str]) -> None:
    """One CDC epoch apply (the body :func:`start_cdc_stream` runs per
    micro-batch, factored out so the concurrency stress drives the
    production path): merge the batch into the store's latest-version
    compaction and publish via pointer swap."""
    from ..operators.cdc import latest_state
    cur = _resolve_store(store_dir)
    merged = batch
    if cur is not None:
        base = spark.read.parquet(cur)
        merged = base.unionByName(batch.select(*base.columns))
    compacted = latest_state(merged, keys, order_cols)
    _swap_in(store_dir, lambda new:
             compacted.write.mode("overwrite").parquet(new))


def read_cdc_store(spark: SparkSession, store_dir: str,
                   deleted_col: str | None = None) -> DataFrame:
    """Reader view of the CDC store: the live rows (tombstones
    filtered) — the FINAL-semantics read of the Replacing view.

    Resolves the store pointer (:func:`_resolve_store`), so the read is
    always one complete published snapshot — a concurrent or crashed
    swap is invisible (the pointer flip is atomic and a version becomes
    current only after its write finished).

    A NULL ``deleted_col`` value counts as live (``coalesce(_, false)``)
    — a feed that only stamps the flag on tombstones doesn't silently
    drop its un-stamped keys."""
    df = spark.read.parquet(_resolve_store(store_dir) or store_dir)
    if deleted_col is not None:
        df = df.filter(~F.coalesce(F.col(deleted_col), F.lit(False)))
    return df


def read_state_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """Reader view of any swap-managed state store (uniq/bitmap/KMV):
    resolves the store pointer and reads that snapshot. Use this (not a
    bare ``read.parquet`` of the store root — the root holds version
    dirs plus the pointer file, not parquet) so the read is one
    consistent published version."""
    return spark.read.parquet(_resolve_store(store_dir) or store_dir)


def start_uniq_state_stream(events_stream: DataFrame, store_dir: str,
                            checkpoint_dir: str, *, keys: list[str],
                            value_col: str,
                            trigger: dict | None = None) -> StreamingQuery:
    """Continuously-maintained ``uniqState`` store — the streaming form
    of ``operators/rollup.py:uniq_register_state``: each micro-batch's
    register rows max-merge into a persisted (keys…, bucket, r) table,
    so 'distinct users per key, any window' reads from the store
    (``uniq_register_merge``) without ever re-scanning the stream's
    history — the AggregatingMergeTree ingest loop (the CH engine
    merges uniqState blocks in the background; here the epoch apply IS
    the merge).

    Delivery semantics: register max-merge is associative, commutative
    and IDEMPOTENT, so epoch replay cannot change the store — the
    strongest exactly-once story available: no ledger, no
    transactionality, correctness from the algebra (same argument as
    ``start_cdc_stream``'s latest-version compaction; stronger than
    the digest anti-join, which must track what it has seen).

    Scale: the store is <= 64 rows per key regardless of stream age or
    cardinality; each epoch merges |batch keys|*64 register rows via
    one key-bounded groupBy and rewrites via atomic swap. For very
    wide key spaces, partition the store by a key column and rewrite
    only touched partitions."""
    from ..operators.rollup import uniq_register_state
    return _start_state_merge_stream(
        events_stream, store_dir, checkpoint_dir,
        state_fn=lambda b: uniq_register_state(b, keys, value_col),
        merge_fn=lambda base, delta: (base.unionByName(delta)
                                      .groupBy(*keys, "bucket")
                                      .agg(F.max("r").alias("r"))),
        trigger=trigger)


def start_bitmap_state_stream(events_stream: DataFrame, store_dir: str,
                              checkpoint_dir: str, *, keys: list[str],
                              value_col: str, chunk_bits: int = 16,
                              trigger: dict | None = None) -> StreamingQuery:
    """Continuously-maintained ``groupBitmapState`` store — the EXACT
    sibling of :func:`start_uniq_state_stream`: each micro-batch's
    chunked distinct-set rows union-merge into a persisted
    (keys…, chunk, vals) table, so live panels read exact distinct
    counts (``bitmap_cardinality``) and exact segment overlap
    (``bitmap_set_cardinalities`` — "users who did A and B so far
    today") from the store, never the stream's history. Set union is
    associative, commutative and IDEMPOTENT, so epoch replay cannot
    change the store — exactly-once from the algebra, no ledger
    (same argument as the register max-merge above).

    Scale: the store is O(distinct values) chunked so no row exceeds
    2^chunk_bits longs; each epoch's merge is one key+chunk-bounded
    groupBy over store ∪ delta. For very wide key spaces, partition
    the store by a key column and rewrite only touched partitions."""
    from ..operators.rollup import bitmap_merge, bitmap_state

    return _start_state_merge_stream(
        events_stream, store_dir, checkpoint_dir,
        state_fn=lambda b: bitmap_state(b, keys, value_col,
                                        chunk_bits=chunk_bits),
        # the batch operator IS the merge (round-7 review: an inline
        # re-implementation could silently drift from the operator the
        # store claims exact parity with)
        merge_fn=lambda base, delta: bitmap_merge(
            base.unionByName(delta), keys),
        trigger=trigger)


def start_kmv_state_stream(events_stream: DataFrame, store_dir: str,
                           checkpoint_dir: str, *, keys: list[str],
                           value_col: str, k: int = 256,
                           trigger: dict | None = None) -> StreamingQuery:
    """Continuously-maintained KMV sketch store — the O(k)-per-key
    sibling of :func:`start_bitmap_state_stream` for cardinalities
    where exact distinct sets can't persist: each micro-batch's min-k
    hash sketches union-truncate into the stored (keys…, kmv) table,
    so live panels read distinct ESTIMATES (``kmv_estimate``) and
    segment union/Jaccard/intersection estimates
    (``kmv_set_estimates``) from the store. Min-k merge is
    associative, commutative and IDEMPOTENT — replay cannot change the
    store; exactly-once from the algebra, no ledger."""
    from ..operators.rollup import kmv_merge, kmv_state

    return _start_state_merge_stream(
        events_stream, store_dir, checkpoint_dir,
        state_fn=lambda b: kmv_state(b, keys, value_col, k=k),
        merge_fn=lambda base, delta: kmv_merge(
            base.unionByName(delta), keys, k=k),
        trigger=trigger)


def _start_state_merge_stream(events_stream: DataFrame, store_dir: str,
                              checkpoint_dir: str, *, state_fn, merge_fn,
                              trigger: dict | None = None) -> StreamingQuery:
    """Shared AggregatingMergeTree ingest loop: per micro-batch, build
    the batch's state rows (``state_fn``), fold them into the persisted
    store (``merge_fn`` — must be associative/commutative/idempotent,
    which is what makes replay safe without a ledger), atomic-swap the
    store directory."""
    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        _apply_state_merge(batch.sparkSession, store_dir, batch,
                           state_fn=state_fn, merge_fn=merge_fn)

    return _start_foreach_batch(events_stream, apply_batch, checkpoint_dir,
                                output_mode="update",
                                trigger=trigger)


def _apply_state_merge(spark: SparkSession, store_dir: str,
                       batch: DataFrame, *, state_fn, merge_fn) -> None:
    """One state-merge epoch apply (the body
    :func:`_start_state_merge_stream` runs per micro-batch, factored out
    so the concurrency stress drives the production path): fold the
    batch's state rows into the persisted store and publish via pointer
    swap."""
    cur = _resolve_store(store_dir)
    merged = state_fn(batch)
    if cur is not None:
        merged = merge_fn(spark.read.parquet(cur), merged)
    _swap_in(store_dir, lambda new:
             merged.write.mode("overwrite").parquet(new))
