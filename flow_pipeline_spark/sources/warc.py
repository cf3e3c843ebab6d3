"""WARC / WET crawl-archive ingestion — the file format web-scale text
corpora are DISTRIBUTED in before they become JSONL: Common Crawl ships
raw captures as WARC (ISO 28500 / the IIPC WARC-1.1 spec), and its
extracted-text sibling as WET (WARC whose records are
``warc-type: conversion`` with a plain-text payload). A training
pipeline that starts from the crawl rather than a curated dump needs
this tier; the reference's only ingress is protobuf-over-Kafka
(`/root/reference/inserter/inserter.go`), so like `sources/jsonl.py`
this extends the source side for the training-data extension.

Spark-first shape:
- files are the parallelism unit (`spark.read.format("binaryFile")` —
  one task per archive, exactly how Common Crawl is processed: ~100k
  archives per crawl, each ~1 GB, embarrassingly parallel); records
  are parsed OUT of each file by an Arrow-batched ``mapInPandas``
  (per-archive imperative framing is the one genuinely non-relational
  step — everything downstream is columnar);
- gzip members decompress per-file (multi-member streams — the
  standard ``.warc.gz`` layout of one member per record — are handled
  by Python's gzip reader transparently); like every gzip source,
  non-splittable: shard into many files, parquet-ize early;
- malformed records QUARANTINE instead of killing the job (the
  jsonl.py contract): each parsed row carries an ``error`` column,
  NULL for clean records — a multi-hour ingest must not die on one
  truncated capture.

The parser implements record framing only (version line + name:value
headers + Content-Length payload + CRLF CRLF gap) — the part of ISO
28500 needed to read real WET/WARC; it does not write archives.
"""

from __future__ import annotations

import gzip
import io
import os
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("record_index", T.LongType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("content_length", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("error", T.StringType()),
])

_HDR_KEEP = {
    "warc-type": "warc_type",
    "warc-record-id": "record_id",
    "warc-target-uri": "target_uri",
    "warc-date": "warc_date",
    "content-type": "content_type",
}


def _parse_warc_bytes(path: str, data: bytes) -> Iterator[dict]:
    """Walk one (decompressed) WARC stream, yielding one dict per
    record; framing errors yield a final quarantine dict (``error``
    set) carrying the unparseable tail as payload and stop — a
    corrupted archive's remainder has no trustworthy record
    boundaries, so resync is not attempted."""
    pos, idx, n = 0, 0, len(data)
    while pos < n:
        # skip inter-record newlines (the two mandated CRLFs + padding;
        # bare-LF gaps too — a 2-byte slice never equals b"\n", the
        # round-6 review's reproduced record-loss bug)
        while pos < n:
            if data[pos:pos + 2] == b"\r\n":
                pos += 2
            elif data[pos:pos + 1] == b"\n":
                pos += 1
            else:
                break
        if pos >= n:
            return
        # header terminator: the EARLIEST of CRLFCRLF / LFLF (the two
        # are byte-disjoint). Preferring CRLF anywhere-in-buffer would
        # mis-frame an LF-header record whose PAYLOAD contains CRLFCRLF
        # (reproduced in the round-6 review).
        i_crlf = data.find(b"\r\n\r\n", pos)
        i_lf = data.find(b"\n\n", pos)
        if i_crlf != -1 and (i_lf == -1 or i_crlf < i_lf):
            hdr_end, sep = i_crlf, 4
        else:
            hdr_end, sep = i_lf, 2
        if hdr_end == -1 or not data[pos:pos + 5].startswith(b"WARC/"):
            yield {"path": path, "record_index": idx, "error":
                   "unparseable record header (no WARC/ version line "
                   "or unterminated header block)",
                   "payload": data[pos:pos + 4096]}
            return
        headers: dict[str, str] = {}
        lines = data[pos:hdr_end].decode("utf-8", "replace").splitlines()
        for line in lines[1:]:          # lines[0] is the version line
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            yield {"path": path, "record_index": idx, "error":
                   "missing or non-integer Content-Length",
                   "payload": data[pos:hdr_end]}
            return
        body_start = hdr_end + sep
        if body_start + length > n:
            yield {"path": path, "record_index": idx, "error":
                   f"truncated payload (Content-Length {length}, "
                   f"{n - body_start} bytes remain)",
                   "payload": data[body_start:body_start + 4096]}
            return
        row = {"path": path, "record_index": idx, "error": None,
               "content_length": length,
               "payload": data[body_start:body_start + length]}
        for h, col in _HDR_KEEP.items():
            row[col] = headers.get(h)
        yield row
        idx += 1
        pos = body_start + length


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC/WET archives under ``path`` (plain or ``.warc.gz`` /
    ``.wet.gz`` — decompressed per file, multi-member-safe) into one
    row per record: ``WARC_SCHEMA`` — record headers promoted to
    columns, raw payload as binary, ``error`` NULL for clean records
    and set (with the offending bytes as payload) for framing
    failures. Filter ``error.isNotNull()`` for the quarantine view.

    Scale: one task per archive (binaryFile), the Common Crawl unit of
    work; the parser is one linear pass per file with no per-record
    Python/JVM round-trips (Arrow batches out). binaryFile caps files
    at 2 GB — real crawl archives are ~1 GB by convention."""
    def parse(batches):
        import pandas as pd
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if path_.endswith(".gz"):
                    # quarantine surface: BadGzipFile is an OSError, but a
                    # TRUNCATED member raises EOFError and mid-stream
                    # deflate corruption raises zlib.error — neither is an
                    # OSError subclass, and one such archive must not kill
                    # the ingest job (round-6 review finding)
                    try:
                        with gzip.GzipFile(fileobj=io.BytesIO(data)) as g:
                            data = g.read()
                    except (OSError, EOFError, zlib.error) as e:
                        rows.append({"path": path_, "record_index": 0,
                                     "error": f"gzip: {e}",
                                     "payload": data[:4096]})
                        continue
                rows.extend(_parse_warc_bytes(path_, data))
            out = pd.DataFrame(rows if rows else None, columns=cols)
            yield out[cols]

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")
    return files.mapInPandas(parse, schema=WARC_SCHEMA)


def utf8_lenient(payload: "F.Column") -> "F.Column":
    """Bytes → string with invalid sequences REPLACED (U+FFFD), never
    fatal. Spark 4's ``F.decode(_, 'UTF-8')`` raises
    MALFORMED_CHARACTER_CODING on bad bytes (reproduced — one
    mis-encoded page would kill a whole crawl ingest), and the lenient
    conf is session-global legacy behavior a vanilla driver session
    won't have; so this is a small Arrow-batched edge using Python's
    errors='replace' decoder — same deliberate-edge rationale as the
    record framing itself. The block decodes via one list comprehension
    over the Arrow batch rather than ``Series.map``+lambda: measured
    ~1.25x on tiny payloads where the pandas dispatch machinery is
    visible, and parity on page-sized payloads where the C-level
    ``bytes.decode`` dominates — i.e. this step is NOT the WET-ingest
    bottleneck at either shape (the framing parser is)."""
    @F.pandas_udf("string")
    def _dec(b: pd.Series) -> pd.Series:
        return pd.Series(
            [None if v is None else bytes(v).decode("utf-8", "replace")
             for v in b.to_numpy()],
            index=b.index, dtype=object)
    return _dec(payload)


def wet_documents(records: DataFrame) -> DataFrame:
    """The WET text view: ``conversion`` records decoded as UTF-8 with
    invalid bytes replaced, never fatal (:func:`utf8_lenient` — real
    crawls routinely carry mis-declared encodings) — one row per
    captured page: ``(record_id, url, fetch_date, text)``. This is the
    frame the curation tier (lang-id → quality gates → dedup) starts
    from; pair with :func:`host_key` on ``url`` for host-level
    quotas."""
    return (records
            .filter(F.col("error").isNull()
                    & (F.col("warc_type") == "conversion"))
            .select(F.col("record_id"),
                    F.col("target_uri").alias("url"),
                    F.col("warc_date").alias("fetch_date"),
                    utf8_lenient(F.col("payload")).alias("text")))


def strip_http_headers(payload: "F.Column") -> "F.Column":
    """For ``response`` records (raw WARC), the payload is the full
    HTTP exchange — status line + headers + body; this strips through
    the first blank line, returning the body bytes (the HTML). JVM
    expression (locate + substring on binary-as-string is lossy for
    bytes, so operate via the documented split point): callers wanting
    exact bytes should prefer the WET sibling, which Common Crawl
    pre-extracts."""
    s = F.decode(payload, "ISO-8859-1")     # byte-preserving charset
    idx = F.locate("\r\n\r\n", s)           # FIRST blank line (1-based)
    body = F.when(idx > 0,
                  F.substring(s, idx + F.lit(4), F.length(s))) \
        .otherwise(s)                        # headerless → pass through
    return F.encode(body, "ISO-8859-1")


def _hdr_safe(v) -> str:
    """WARC header-value sanitizer: a bare CR/LF (or other C0 control)
    inside an interpolated value terminates the header block early and
    breaks record framing — the reader then quarantines the record AND
    stops at the framing error, losing every later record in the
    archive (round-7 review; crawl Target-URIs are adversarial).
    Control characters are illegal in URIs anyway; percent-encode them
    so control-character variants of a value stay distinct. NOT a
    reversible encoding: a value that already contains a literal
    ``%0A`` collides with an encoded newline — acceptable for header
    identity/quota keys, which is all these fields feed."""
    s = str(v)
    if not any(ord(c) < 0x20 or ord(c) == 0x7F for c in s):
        return s
    return "".join(f"%{ord(c):02X}" if (ord(c) < 0x20 or ord(c) == 0x7F)
                   else c for c in s)


def _stream_wet_records(rows, tmp: str, final: str, *,
                        text_col: str, url_col: str, id_col: str,
                        date: str, gzip_files: bool) -> bool:
    """Per-partition WET writer core: frame each row as a ``conversion``
    record and STREAM it straight into the (optionally gzipped) tmp
    file, then atomically publish via ``os.replace``. Peak memory is one
    record plus the fixed gzip window — independent of partition size
    (the round-6 review's buffering form held ~2.3x the whole archive in
    Python heap per task: every framed record, the ``b"".join`` copy,
    and the ``gzip.compress`` output — ~70 GB across 32 local tasks at
    the CC 1 GB-archive convention). ``mtime=0`` pins the gzip header so
    speculative attempts produce byte-identical archives. Returns False
    for an empty partition (no file written); on error the tmp is
    best-effort removed (leftovers start with '.', which Hadoop's
    hidden-file filter keeps out of read listings)."""
    raw = sink = None
    try:
        for r in rows:
            if raw is None:
                raw = open(tmp, "wb")
                # filename="" and mtime=0 pin the gzip header bytes —
                # without them the header embeds the ATTEMPT-unique tmp
                # name and wall clock, breaking attempt determinism
                sink = (gzip.GzipFile(filename="", fileobj=raw,
                                      mode="wb", mtime=0)
                        if gzip_files else raw)
            payload = (r[text_col] or "").encode("utf-8")
            hdr = (f"WARC/1.1\r\nWARC-Type: conversion\r\n"
                   f"WARC-Record-ID: <urn:doc:{_hdr_safe(r[id_col])}>\r\n"
                   f"WARC-Target-URI: {_hdr_safe(r[url_col])}\r\n"
                   f"WARC-Date: {date}\r\n"
                   f"Content-Length: {len(payload)}\r\n\r\n")
            sink.write(hdr.encode() + payload + b"\r\n\r\n")
        if raw is None:
            return False
        if sink is not raw:
            sink.close()            # flush the gzip trailer
        raw.close()
        os.replace(tmp, final)
        return True
    except BaseException:
        if raw is not None:
            for closer in (sink.close if sink is not None else None,
                           raw.close):
                try:
                    if closer:
                        closer()
                except Exception:
                    pass
            try:
                os.remove(tmp)
            except OSError:
                pass
        raise


def write_wet(df: DataFrame, out_dir: str, *, text_col: str = "text",
              url_col: str = "url", id_col: str = "doc_id",
              date: str = "2026-01-01T00:00:00Z",
              gzip_files: bool = True) -> None:
    """WET writer — publish a text corpus AS crawl archives (the inverse
    of :func:`read_warc` + :func:`wet_documents`; round-trip losslessness
    is oracle-proven by the ``wet_ingest`` registry query): each input
    partition writes one ``part-NNNNN.wet[.gz]`` of ``conversion``
    records with exact Content-Length framing, so any WET consumer
    (including this repo's reader) recovers the text byte-for-byte.

    Scale: executor-side writes, one file per partition, no row through
    the driver — ``repartition(n)`` upstream to choose the archive
    count/size (CC convention ~1 GB per archive); records STREAM into
    the gzip file as the partition iterator yields them, so task memory
    stays flat regardless of archive size
    (:func:`_stream_wet_records`; peak asserted by pytest). Retry-safe:
    each task ATTEMPT writes its own tmp file and atomically publishes
    the deterministic per-partition path via ``os.replace`` — concurrent
    speculative attempts can't interleave bytes, and whichever complete
    attempt lands last wins with identical content (gzip mtime pinned).
    ``out_dir`` must be storage every executor can reach (local-mode
    dir, NFS, or a FUSE-mounted object store; on a real cluster prefer
    the object store)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_part(rows) -> None:
        from pyspark import TaskContext
        tc = TaskContext.get()
        pid = tc.partitionId()
        ext = ".wet.gz" if gzip_files else ".wet"
        # tmp is ATTEMPT-unique: speculative twins sharing one tmp path
        # could interleave/truncate each other mid-write and publish a
        # corrupt archive (round-6 review); with per-attempt tmps each
        # os.replace publishes one attempt's complete bytes, last wins.
        tmp = os.path.join(
            out_dir, f".part-{pid:05d}.a{tc.taskAttemptId()}{ext}.tmp")
        _stream_wet_records(
            rows, tmp, os.path.join(out_dir, f"part-{pid:05d}{ext}"),
            text_col=text_col, url_col=url_col, id_col=id_col,
            date=date, gzip_files=gzip_files)

    df.select(id_col, url_col, text_col).foreachPartition(write_part)


def host_key(url: "F.Column",
             psl: "list[str] | None" = None) -> "F.Column":
    """Normalized host key for per-domain curation quotas (crawl
    pipelines cap documents per host so no single site dominates the
    corpus — compose this as the ``group_col``/``source_col`` of
    ``packing.source_quota_sample`` or ``weighted_sample``): lowercased
    hostname via the built-in ``parse_url`` (JVM expression, zero UDF),
    with a leading ``www.`` stripped and any ``:port`` removed. NULL
    for unparseable URLs — filter or quarantine upstream.

    By default NOT public-suffix-aware: subdomains count as distinct
    hosts, the conservative direction for quota caps. Pass ``psl`` (the
    public-suffix list — a DATA file, e.g. publicsuffix.org's dat as
    lines; comments and blanks are skipped) to key by REGISTRABLE
    DOMAIN instead: the longest matching rule plus one more label
    (``shop.example.co.uk`` → ``example.co.uk``). All three PSL rule
    forms are honored (round-7 review — the real dat file carries
    ~1000 non-literal rules): literal suffixes, ``*.b`` wildcards (any
    direct child of ``b`` is a suffix), and ``!x.b`` exceptions
    (``x.b`` is NOT a suffix despite a covering wildcard; its parent
    is). Hosts no rule matches fall back to the PSL's prevailing-``*``
    rule (last label is the suffix → last two labels); a host that IS
    a public suffix keys as itself. Pure Column expressions — the rule
    probes compile to ``InSet`` over the list literals (the bm25
    stored-index ``isin`` device), evaluated per-row JVM-side against
    candidate suffixes built with array higher-order functions; no
    UDF, no join, no shuffle."""
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    host = F.regexp_replace(host, r":\d+$", "")
    if psl is None:
        return F.regexp_replace(host, r"^www\.", "")
    exact, wild, exc = set(), set(), set()
    for line in psl:
        line = line.strip().lower()
        if not line or line.startswith("//"):
            continue
        if line.startswith("!"):
            exc.add(line[1:])
            # an exception's public suffix is itself minus its first
            # label (e.g. !www.ck -> suffix ck) — register it so the
            # exception resolves by rule, not by the fallback
            if "." in line[1:]:
                exact.add(line[1:].split(".", 1)[1])
        elif line.startswith("*."):
            wild.add(line[2:])
        else:
            exact.add(line)

    def _in(col, values):
        vals = sorted(values)
        return col.isin(*vals) if vals else F.lit(False)

    labels = F.split(host, r"\.")
    n = F.size(labels)

    def cand(k):            # the last k labels of the host, joined
        return F.array_join(F.slice(labels, n - k + 1, k), ".")

    matched_ks = F.filter(
        F.sequence(F.lit(1), n),
        lambda k: (_in(cand(k), exact)
                   | ((k >= F.lit(2)) & _in(cand(k - 1), wild)))
        & ~_in(cand(k), exc))
    suffix_len = F.when(F.size(matched_ks) > 0,
                        F.element_at(matched_ks, -1)
                        ).otherwise(F.lit(1))       # prevailing-* rule
    # IP-literal hosts (common in crawl data) have no registrable
    # domain: the prevailing-* fallback would key 1.2.3.4 and 9.8.3.4
    # both as "3.4", merging unrelated servers into one quota bucket
    # (round-7 review). Key them by the full literal, matching both the
    # default (psl=None) behavior and real PSL libraries' IP handling.
    is_ip = (host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")    # IPv4
             | host.contains(":"))                     # IPv6 (any form)
    return F.when(is_ip | (n <= suffix_len), host).otherwise(
        F.array_join(F.slice(labels, n - suffix_len, suffix_len + 1),
                     "."))
