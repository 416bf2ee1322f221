"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API).

The modern extension surface for sources Spark has no connector for —
implemented here as a deterministic synthetic billing-ledger GENERATOR
so the cross-engine oracle can predict every row arithmetically (the
same trick as the WAV decode entry): row i has

    account_id   = i % 97
    amount_cents = (i * i) % 10_000
    day          = DATE '2024-01-01' + (i % 90)

Real API coverage, not a toy shim:

* ``partitions()`` splits the row space into ranges — Spark schedules
  one task per ``InputPartition``, so the source is read in parallel
  exactly like a file-based scan's splits.
* ``pushFilters()`` (Spark 4.1) accepts range/equality predicates on
  ``row_id`` and narrows the generated ranges BEFORE partition
  planning — rows outside the bounds are never produced at all (the
  generator's equivalent of predicate pushdown into a parquet scan);
  unsupported filters are returned to Spark to evaluate on top.

Scale notes: a generator source has no files to prune, so pushed
row-range bounds ARE its partition pruning; each partition yields rows
lazily (tuples, Arrow-batched by the worker), driver state is the
option dict only.
"""

from __future__ import annotations

from mycarely_saas_dbt_spark.util import await_or_raise
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

LEDGER_SCHEMA = "row_id bigint, account_id bigint, amount_cents bigint, day date"
DEFAULT_ROWS = 10_000
DEFAULT_PARTS = 8


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class LedgerReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", DEFAULT_ROWS))
        self.n_parts = int(options.get("n_parts", DEFAULT_PARTS))
        self.lo, self.hi = 0, self.n_rows  # [lo, hi) after pushdown

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, (EqualTo, GreaterThan, GreaterThanOrEqual,
                              LessThan, LessThanOrEqual)) and f.attribute == ("row_id",):
                v = f.value
                if isinstance(f, EqualTo):
                    self.lo, self.hi = max(self.lo, v), min(self.hi, v + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, v)
                else:
                    self.hi = min(self.hi, v + 1)
                # accepted: do NOT yield it back — rows outside the bound
                # are never generated (checked by test_pyds_pushdown)
            else:
                yield f  # unsupported: Spark evaluates it post-scan

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, min(self.n_parts, hi - lo or 1))
        step = max(1, -(-(hi - lo) // n))
        return [_Range(s, min(s + step, hi)) for s in range(lo, hi, step)] or [
            _Range(0, 0)
        ]

    def read(self, part: _Range):
        # Arrow RecordBatch output (the API's vectorized variant): one
        # numpy pass per partition instead of a Python tuple per row —
        # the same ~100x batch-vs-row economics as pandas UDFs, and the
        # only sane shape for a source feeding a 1000-executor scan.
        import numpy as np
        import pyarrow as pa

        i = np.arange(part.start, part.end, dtype=np.int64)
        days = (i % 90).astype("timedelta64[D]") + np.datetime64("2024-01-01")
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(i),
                pa.array(i % 97),
                pa.array((i * i) % 10_000),
                pa.array(days.astype("datetime64[D]")),
            ],
            names=["row_id", "account_id", "amount_cents", "day"],
        )


class LedgerDataSource(DataSource):
    @classmethod
    def name(cls):
        return "mycarely_ledger"

    def schema(self):
        return LEDGER_SCHEMA

    def reader(self, schema):
        return LedgerReader(self.options)


def register_ledger_source(spark) -> None:
    # Spark 4.1 refuses to PLAN any Python source implementing pushFilters()
    # unless spark.sql.python.filterPushdown.enabled is true — a session-level
    # runtime conf the engine's own factory sets but a foreign session (the
    # driver's verify harness) may not. Apply the engine's runtime confs here
    # so registering the source is sufficient to use it.
    from mycarely_saas_dbt_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    spark.dataSource.register(LedgerDataSource)


# ---------------------------------------------------------------------------
# Manifest-tailing STREAMING source (r7): stream a manifest-committed
# target the way the Delta streaming source tails the transaction log.
# Offsets are manifest VERSION numbers; a micro-batch's input is the set
# of data files ADDED between the start and end versions' manifests
# (computed from the two manifest JSONs alone — no listing, no data
# read on the driver). Executors read each file as Arrow record batches
# and re-attach hive partition-column values parsed from the file's
# partition path. Like Delta, the source requires append-only history:
# a version that REMOVED files (a rewriting merge) raises rather than
# silently replaying rewritten rows; offsets pointing at vacuumed
# manifests raise a retention error.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceStreamReader


class _ManifestFile(InputPartition):
    def __init__(self, path: str, rel: str):
        self.path, self.rel = path, rel


def _manifest_json(root: str, model: str, version: int) -> dict | None:
    import os

    mdir = os.path.join(root, model, "_manifest")
    p = os.path.join(mdir, f"v{version:06d}.json")
    if not os.path.isfile(p):
        return None
    # the shared loader hydrates checkpointed (segment-backed) manifests
    # lazily; inline manifests come back as plain dicts
    from mycarely_saas_dbt_spark.incremental import load_manifest_file

    return load_manifest_file(p)


def _version_before_timestamp(root: str, model: str, ts: float) -> int:
    """Delta's CDF ``startingTimestamp`` rule: stream every change
    committed AT OR AFTER ``ts`` — i.e. start one version BEFORE the
    first commit whose provenance stamp is >= ts. When ts is later than
    every retained commit, start at CURRENT (only future commits
    stream). When the whole retained history qualifies, this resolves to
    the version before the earliest retained commit: 0 means the
    snapshot bootstrap (correct — nothing preceded it), while a vacuumed
    intermediate anchor raises the existing retention error in
    partitions(), Delta's changes-no-longer-available behavior."""
    import os
    import re as _re

    mdir = os.path.join(root, model, "_manifest")
    if not os.path.isdir(mdir):
        return 0
    vers = sorted(
        int(m.group(1))
        for f in os.listdir(mdir)
        if (m := _re.fullmatch(r"v(\d{6})\.json", f))
    )
    for v in vers:
        m = _manifest_json(root, model, v)
        if m is not None and m.get("ts") is not None and m["ts"] >= ts:
            return v - 1
    return _manifest_current_version(root, model)


def _manifest_current_version(root: str, model: str) -> int:
    import os

    cur = os.path.join(root, model, "_manifest", "CURRENT")
    if not os.path.isfile(cur):
        return 0
    with open(cur) as fh:
        return int(fh.read().strip().removeprefix("v").removesuffix(".json"))


class ManifestStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.root = options["root"]
        self.model = options["model"]
        # admission control (Delta's maxFilesPerTrigger analogue at the
        # version granularity): bound how many manifest VERSIONS one
        # micro-batch may advance, so a stream recovering from a long
        # outage catches up in bounded-size batches instead of one
        # giant batch that overwhelms executor memory / sink commit size.
        # Contract (bounded by the Python stream API, which has no
        # start-aware latestOffset and probes latestOffset BEFORE
        # initialOffset): the FIRST planned batch of each run is
        # unbounded (the catch-up), every subsequent batch of the run
        # advances at most max_versions — the steady-state protection
        # for a running stream that falls behind bursty commits.
        self.max_versions = int(options.get("maxversionsperbatch", 0)) or None
        # progression state for admission control. None = this reader has
        # not yet learned the stream's position (checkpoint restart):
        # Spark 4.1's DataSourceStreamReader latestOffset is not
        # start-aware, so bounding it below the restored committed offset
        # would plan a backwards batch. The FIRST post-restart batch is
        # therefore unbounded (a documented catch-up); initialOffset (only
        # called on a fresh stream) and partitions() teach the position,
        # after which every batch is bounded.
        self._last_end: int | None = None
        # ONE manifest snapshot seeds boot state (ADVICE r12): version and
        # dtypes must come from the SAME read — deriving them from two
        # separate reads lets a rename committed in between leave dtypes
        # one version newer than the recorded boot version, permanently
        # tripping the CDF subclass's stale-schema restart check.
        boot_v = _manifest_current_version(self.root, self.model)
        cur = _manifest_json(self.root, self.model, boot_v)
        self._boot_version = boot_v
        if (cur or {}).get("colmap") and not self._colmap_ok(cur):
            # column mapping: the files carry PHYSICAL names the stream
            # would misalign against these logical dtypes — Delta likewise
            # blocks streaming reads across column-mapping changes
            raise RuntimeError(
                f"{self.model}: streaming a column-mapped table is not "
                "supported — absorb the mapping (compact) and restart"
            )
        self.dtypes = (cur or {}).get("dtypes") or []
        self.partition_by = (cur or {}).get("partition_by") or []

    def _colmap_ok(self, cur: dict) -> bool:
        """May this reader serve a table with a PENDING column mapping?
        The raw file stream never can (it reads committed files, which
        carry physical names). The change-feed subclass can when the
        table writes change files (its legs translate per version) —
        see the override."""
        return False

    def initialOffset(self) -> dict:
        self._last_end = 0
        return {"version": 0}

    def latestOffset(self) -> dict:
        # NOT mutating: the engine may probe latestOffset several times
        # before a batch is planned (availability checks) — advancing
        # here would silently widen the bound. The position advances in
        # partitions()/commit(), i.e. only when a batch actually runs.
        cur = _manifest_current_version(self.root, self.model)
        if self.max_versions is not None and self._last_end is not None:
            cur = min(cur, self._last_end + self.max_versions)
        return {"version": cur}

    def _manifest_at(self, version: int) -> dict | None:
        if version == 0:
            return None
        m = _manifest_json(self.root, self.model, version)
        if m is None:
            raise RuntimeError(
                f"{self.model}: manifest v{version} is beyond the vacuum "
                "retention horizon — the stream fell behind"
            )
        return m

    def _files(self, version: int) -> set:
        m = self._manifest_at(version)
        if m is None:
            return set()
        return {
            (rel, f) for rel, fl in m["partitions"].items() for f in fl
        }

    def partitions(self, start: dict, end: dict):
        import os

        # teach admission control the authoritative position (restart path)
        self._last_end = max(self._last_end or 0, end["version"])
        m_s = self._manifest_at(start["version"])
        m_e = self._manifest_at(end["version"])
        fs = {
            (rel, f)
            for rel, fl in ((m_s or {}).get("partitions") or {}).items()
            for f in fl
        }
        fe = {
            (rel, f)
            for rel, fl in ((m_e or {}).get("partitions") or {}).items()
            for f in fl
        }
        removed = fs - fe
        if removed:
            raise RuntimeError(
                f"{self.model}: versions ({start['version']}, "
                f"{end['version']}] rewrote or removed "
                f"{len(removed)} committed files — the stream source "
                "requires append-only history (the Delta streaming-source "
                "contract)"
            )
        # ADVICE r8 (medium): a deletion-vector commit changes NO file
        # list, so without this check the version diff would plan an
        # empty batch and downstream consumers would silently keep
        # serving logically deleted rows. A growing vector raises like
        # the removed-files guard; streaming deletes is what the
        # change-feed source (mycarely_manifest_cdf) is for.
        dv_s = set((((m_s or {}).get("dv") or {}).get("files")) or [])
        dv_e = set((((m_e or {}).get("dv") or {}).get("files")) or [])
        if dv_e - dv_s:
            raise RuntimeError(
                f"{self.model}: versions ({start['version']}, "
                f"{end['version']}] added deletion-vector sidecar(s) — the "
                "append-only stream source cannot represent deletes; "
                "stream the change feed (mycarely_manifest_cdf) instead, "
                "or absorb the vector first"
            )
        base = os.path.join(self.root, self.model)
        return [
            _ManifestFile(
                os.path.join(base, rel, f) if rel else os.path.join(base, f),
                rel,
            )
            for rel, f in sorted(fe - fs)
        ]

    def read(self, part: _ManifestFile):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        # hive partition values parsed off the file's partition path
        pvals = {}
        if part.rel:
            for col, seg in zip(self.partition_by, part.rel.split("/")):
                pvals[col] = seg.split("=", 1)[1]

        def const_array(tname: str, val: str, n: int):
            if tname == "date":
                return pa.array([dt.date.fromisoformat(val)] * n, pa.date32())
            if tname in ("bigint", "long"):
                return pa.array([int(val)] * n, pa.int64())
            if tname in ("int", "smallint", "tinyint"):
                return pa.array([int(val)] * n, pa.int32())
            return pa.array([val] * n, pa.string())

        tbl = pq.read_table(part.path)
        n = tbl.num_rows
        cols, names = [], []
        for cname, tname in self.dtypes:
            if cname in pvals:
                cols.append(const_array(tname, pvals[cname], n))
            else:
                cols.append(tbl.column(cname).combine_chunks())
            names.append(cname)
        yield from pa.Table.from_arrays(cols, names=names).to_batches()

    def commit(self, end: dict) -> None:
        self._last_end = max(self._last_end or 0, end["version"])


class ManifestStreamDataSource(DataSource):
    @classmethod
    def name(cls):
        return "mycarely_manifest_stream"

    def schema(self):
        cur = _manifest_json(
            self.options["root"],
            self.options["model"],
            _manifest_current_version(
                self.options["root"], self.options["model"]
            ),
        )
        if cur is None or not cur.get("dtypes"):
            raise RuntimeError(
                "manifest stream source needs a committed target with dtypes"
            )
        return ", ".join(f"`{n}` {t}" for n, t in cur["dtypes"])

    def streamReader(self, schema):
        return ManifestStreamReader(self.options)


def register_manifest_stream_source(spark) -> None:
    spark.dataSource.register(ManifestStreamDataSource)


# ---------------------------------------------------------------------------
# CHANGE-FEED streaming source (VERDICT r8 item 5 — the readChangeFeed
# mode): micro-batches are `table_changes(from_v, to_v)` rows — full row
# images tagged insert / update_postimage / delete — instead of raw
# appended files, so rewriting commits (copy-on-write DELETE/UPDATE,
# MERGE) and deletion-vector commits STREAM rather than raise. This is
# the consumer that makes the CDC/CDF surface end-to-end streamable: a
# silver table (or a delete-aware index) applies base deletes
# automatically via a tombstone-merge sink.
#
# Semantics mirror the batch `IncrementalRunner.table_changes` exactly:
# the diff is between the LIVE states of the two snapshots (each side
# read through its own deletion vector), collapsed per batch (a row
# inserted then updated inside one version range shows once, with the
# final image — the same collapse Delta applies within one commit).
#
# Scale shape (r10 — VERDICT r9 item 1): for tables with
# spec.change_data, every mutating commit ALSO committed its change rows
# as key-bucketed `_change_data/` files, and a batch over such versions
# is a PURE FILE READ — one netting task per key bucket, task memory =
# that bucket's change rows, never a snapshot. The snapshot-diff path
# below survives as the fallback for versions without change files
# (full refresh, RESTORE, never-opted-in tables): one task per CHANGED
# partition-rel, arrow/pandas inside the task; its deletion-vector leg
# reads the KB-scale sidecars and scans only from-snapshot files whose
# manifest min/max can contain a newly-deleted key. The initial load
# (startingversion 0) is one task per committed FILE, emitted as
# inserts — Delta's initial-snapshot semantics.
# ---------------------------------------------------------------------------


class _CdfRelDiff(InputPartition):
    def __init__(self, rel, old_files, new_files, dv_old, dv_new,
                 positional=False, key_lo=None, key_hi=None):
        self.rel = rel
        self.old_files, self.new_files = old_files, new_files
        self.dv_old, self.dv_new = dv_old, dv_new  # sidecar paths
        self.positional = positional
        # optional KEY-RANGE slice [key_lo, key_hi) — the planner splits
        # an oversized rel diff into range sub-tasks using the
        # manifest's per-file min/max stats (VERDICT r10 item 5); each
        # side loads only the files whose stats intersect the range and
        # clips rows to it, so a key's old/new images still meet in one
        # task while task memory tracks the range's bytes, not the rel's
        self.key_lo, self.key_hi = key_lo, key_hi


class _CdfDvLeg(InputPartition):
    def __init__(self, rel, files, dv_old, dv_new):
        self.rel = rel
        self.files = files
        self.dv_old, self.dv_new = dv_old, dv_new


class _CdfSnapshotInsert(InputPartition):
    """Bootstrap leg (start version 0): ONE committed data file, emitted
    as inserts — the initial load never concatenates a whole partition
    into one task."""

    def __init__(self, path, rel, dv_new, positional=False, ren=None):
        self.path, self.rel, self.dv_new = path, rel, dv_new
        self.positional = positional
        # PENDING column mapping at the end manifest: committed files
        # carry physical names; `ren` (physical -> logical) aliases them
        # at read — a single-manifest translation, the streaming twin of
        # the batch reader's `_read_files` chokepoint
        self.ren = ren or None


class _CdfChangeBucket(InputPartition):
    """Write-time change-file leg: every `_change_data/` file of one or
    more WHOLE key buckets across the batch's versions. Bucketing at
    write time puts all of a key's events in the same bucket, so
    per-batch netting is local to the task; task memory is the packed
    buckets' CHANGE rows — never a snapshot. The planner packs whole
    buckets into one leg by on-disk byte size (VERDICT r10 item 1:
    write-fine, group-coarse), so the cap holds regardless of churn or
    catch-up depth while each key's events stay within one task.

    ``srcs`` (r12 — rename-aware feeds): per VERSION, declared output
    column -> the name it carries in that version's change files (the
    rename chain composed from commit provenance by the planner). A
    declared column absent from its version's map did not exist then
    (NULL-fill) or was dropped on the way (its era bytes must never be
    read — the resurrection fence at the feed level)."""

    def __init__(self, buckets, files, srcs=None):
        self.buckets = tuple(buckets)
        self.files = files  # [(version, abs path), ...] version-ordered
        self.srcs = srcs or {}


def _dv_key_set(paths) -> set:
    import pyarrow.parquet as pq

    keys: set = set()
    for p in paths:
        t = pq.read_table(p)
        keys.update(t.column(0).to_pylist())
    return keys


def _strip_scheme(p: str) -> str:
    """Normalize a possibly-URI-style path (``file:/x``, ``file:///x``,
    percent-encoded) to the plain filesystem path used as the key in
    ``load()``/``_dv_pos_map`` — the same urlparse+unquote rule as
    ``IncrementalRunner._fs_path``. A naive prefix strip handled only
    the ``file:/x`` form; any other Hadoop path spelling would silently
    stop positional tombstones from applying (ADVICE r10)."""
    if "://" in p or p.startswith("file:"):
        from urllib.parse import unquote, urlparse

        return unquote(urlparse(p).path)
    return p


def _dv_pos_map(paths) -> dict:
    """POSITIONAL sidecars -> {fs path: {row ordinals}} (KB-scale)."""
    import pyarrow.parquet as pq

    out: dict = {}
    for p in paths:
        t = pq.read_table(p, columns=["file", "pos"])
        for f, pos in zip(
            t.column("file").to_pylist(), t.column("pos").to_pylist()
        ):
            out.setdefault(_strip_scheme(f), set()).add(pos)
    return out


CDF_TASK_TARGET_BYTES = 32 * 1024 * 1024


class ManifestCDFStreamReader(ManifestStreamReader):
    def __init__(self, options):
        super().__init__(options)
        # the declared output schema is the stream-start logical schema;
        # rename translation composes per-era chains up to this version.
        # Derived from the SAME manifest snapshot the base initializer
        # loaded dtypes from (ADVICE r12) — a second read here could see
        # a rename committed in between and misalign version vs schema.
        self._init_version = self._boot_version
        self.key = options["key"]
        self.start_version = int(options.get("startingversion", 0))
        st = options.get("startingtimestamp")
        if st is not None:
            if options.get("startingversion") is not None:
                raise ValueError(
                    f"{self.model}: pass startingversion OR "
                    "startingtimestamp, not both"
                )
            self.start_version = _version_before_timestamp(
                self.root, self.model, float(st)
            )
        # cap on one netting task's change-file bytes (the packer groups
        # whole buckets up to this); option `cdfTaskTargetBytes`
        self.task_target_bytes = int(
            options.get("cdftasktargetbytes", CDF_TASK_TARGET_BYTES)
        )
        # Delta's four-type feed: emit update_preimage rows (the OLD
        # image) alongside update_postimage — what exact incremental
        # view maintenance consumes (subtract old, add new)
        self.preimages = str(options.get("preimages", "false")).lower() == "true"

    def _colmap_ok(self, cur: dict) -> bool:
        # a change-data table with a PENDING mapping still streams: the
        # change-file legs translate per version (`srcs`) and a
        # bootstrap batch aliases physical->logical from the one end
        # manifest; only the snapshot-diff fallback refuses (see
        # `partitions`). Tables without change files keep the refusal.
        return cur.get("cdc") is not None

    def initialOffset(self) -> dict:
        self._last_end = self.start_version
        return {"version": self.start_version}

    def _dv_paths(self, m: dict | None) -> list:
        import os

        files = (((m or {}).get("dv")) or {}).get("files") or []
        root = os.path.join(self.root, self.model, "_dv")
        return [os.path.join(root, f) for f in files]

    def partitions(self, start: dict, end: dict):
        import os

        self._last_end = max(self._last_end or 0, end["version"])
        m_s = self._manifest_at(start["version"])
        m_e = self._manifest_at(end["version"])
        if m_e is None:
            return [_CdfRelDiff("", [], [], [], [])]
        dvk = ((m_e.get("dv") or {}).get("key"))
        if dvk is not None and dvk != self.key:
            raise RuntimeError(
                f"{self.model}: change feed keyed on {self.key!r} but the "
                f"deletion vector is keyed on {dvk!r}"
            )
        base = os.path.join(self.root, self.model)

        def absf(rel, f):
            return os.path.join(base, rel, f) if rel else os.path.join(base, f)

        parts_s = (m_s or {}).get("partitions") or {}
        parts_e = m_e.get("partitions") or {}
        dv_old = self._dv_paths(m_s)
        dv_new = self._dv_paths(m_e)
        positional = bool(
            ((m_e.get("dv") or {}).get("positional"))
            or (((m_s or {}).get("dv") or {}).get("positional"))
        )
        if m_s is None:
            # bootstrap (startingversion 0): everything live at `end`
            # arrives as inserts — one task per committed FILE, each
            # reading that file plus the KB-scale vector sidecars. Plans
            # from the END manifest only, so interior renames that were
            # later absorbed cannot misalign anything; a PENDING mapping
            # translates physical->logical per file from this one
            # manifest (the streaming twin of `_read_files`).
            ren = {p: l for l, p in (m_e.get("colmap") or {}).items()}
            legs = [
                _CdfSnapshotInsert(absf(rel, f), rel, dv_new, positional, ren)
                for rel, fl in sorted(parts_e.items())
                for f in fl
            ]
            return legs or [_CdfRelDiff("", [], [], [], [])]
        legs = self._change_file_legs(start["version"], end["version"])
        if legs is not None:
            # every version in the batch committed write-time change
            # files: NO base data file is opened — one netting task per
            # key bucket (DV deletes are already IN the change files;
            # renames translate per version via the legs' `srcs` maps)
            return legs or [_CdfRelDiff("", [], [], [], [])]
        # ---- snapshot-diff fallback: it reads BASE files under the
        # declared logical dtypes, which genuinely cannot represent a
        # rename inside the range (pre-rename rows would misalign and
        # fabricate changes) — refuse, Delta's streaming restriction.
        # Change-data tables never reach here for rename ranges (the
        # change-file legs above serve them).
        for v in range(start["version"] + 1, end["version"] + 1):
            mi = _manifest_json(self.root, self.model, v)
            if mi is not None and (
                mi.get("colmap") or mi.get("op") == "RENAME COLUMN"
            ):
                raise RuntimeError(
                    f"{self.model}: the change stream crossed a column "
                    f"rename (version {v}) — restart the stream from a "
                    "post-rename version, or enable spec.change_data "
                    "(write-time change files net across renames)"
                )
        if (m_e.get("colmap") or (m_s or {}).get("colmap")):
            raise RuntimeError(
                f"{self.model}: the change stream crossed a column-mapping "
                "change — absorb the mapping (compact) and restart"
            )
        if positional and set((m_e.get("dv") or {}).get("files") or []) != set(
            ((m_s or {}).get("dv") or {}).get("files") or []
        ):
            # same rule as batch table_changes: a positional-DV commit
            # permits re-inserted keys, which a key-based snapshot diff
            # cannot represent — require write-time change files
            raise RuntimeError(
                f"{self.model}: change feed across a positional-DV commit "
                "requires change_data (write-time change files)"
            )
        out = []
        for rel in sorted(set(parts_s) | set(parts_e)):
            if parts_s.get(rel) == parts_e.get(rel):
                continue  # untouched rel: live-state change only via DV leg
            out.extend(
                self._rel_diff_legs(
                    rel,
                    [(f, absf(rel, f)) for f in parts_s.get(rel, [])],
                    [(f, absf(rel, f)) for f in parts_e.get(rel, [])],
                    m_s, m_e, dv_old, dv_new, positional,
                )
            )
        if positional:
            # dv unchanged across the range (checked above): both sides
            # of every rel diff read through the same position map inside
            # the task; no DV leg to plan
            return out or [_CdfRelDiff("", [], [], [], [])]
        # deletion-vector leg: keys newly added to the vector emit
        # delete rows with their FROM-snapshot images. Sidecars are
        # KB-scale — read driver-side to prune candidate files via the
        # manifest's per-file [min, max] stats for the key column.
        new_keys = _dv_key_set(dv_new) - _dv_key_set(dv_old)
        if new_keys and m_s is not None:
            stats = m_s.get("stats") or {}
            skeys = sorted(new_keys)
            import bisect

            def may_contain(rel, f) -> bool:
                b = (stats.get(rel) or {}).get(f, {}).get(self.key)
                if not b:
                    return True  # no stats: conservatively keep
                lo, hi = b
                i = bisect.bisect_left(skeys, lo)
                return i < len(skeys) and skeys[i] <= hi

            for rel, fl in parts_s.items():
                cand = [absf(rel, f) for f in fl if may_contain(rel, f)]
                if cand:
                    out.append(_CdfDvLeg(rel, cand, dv_old, dv_new))
        return out or [_CdfRelDiff("", [], [], [], [])]

    def _rel_diff_legs(
        self, rel, old_pairs, new_pairs, m_s, m_e, dv_old, dv_new, positional
    ) -> list:
        """Plan one changed rel's snapshot-diff task(s) — the fallback
        for versions without write-time change files (legacy tables,
        full refresh, RESTORE). Default: ONE task for the rel. When the
        rel's combined bytes exceed the task target AND every file on
        both sides carries numeric key min/max stats in its manifest,
        split the KEY SPACE into byte-balanced ranges instead (VERDICT
        r10 item 5): boundaries are chosen at file minima by greedy byte
        packing (a metadata decision — stats from the manifests, sizes
        from stat()), each sub-task reads only the files intersecting
        its range and clips rows to it. A key's two snapshots still meet
        in exactly one task, so the diff is the union of the range
        diffs; the byte cap is best-effort under heavily overlapping
        file ranges (a sorted/clustered layout — the normal case at
        scale — packs tightly)."""
        import os

        def single():
            return [_CdfRelDiff(
                rel, [p for _, p in old_pairs], [p for _, p in new_pairs],
                dv_old, dv_new, positional,
            )]

        metas = []  # (side, abs path, bytes, kmin, kmax) — None bounds
        total = 0   # mean "no usable stats": assigned to EVERY range
        for side, pairs, m in (("o", old_pairs, m_s), ("n", new_pairs, m_e)):
            stats = ((m or {}).get("stats") or {}).get(rel) or {}
            for name, ap in pairs:
                b = (stats.get(name) or {}).get(self.key)
                ok = (
                    b
                    and len(b) == 2
                    and all(
                        isinstance(x, (int, float)) and not isinstance(x, bool)
                        for x in b
                    )
                )
                try:
                    sz = os.path.getsize(ap)
                except OSError:
                    return single()
                # a stats-less file (empty shuffle part, or a non-numeric
                # key) rides into every sub-task: the read-side row clip
                # sends each of its rows to exactly one range, so this is
                # a cost concession, never a correctness one
                metas.append(
                    (side, ap, sz, b[0] if ok else None, b[1] if ok else None)
                )
                total += sz
        statful = [t for t in metas if t[3] is not None]
        if total <= self.task_target_bytes or len(statful) < 2:
            return single()
        # greedy byte packing over stats-bearing files sorted by key
        # minimum; range boundaries land at group-leading minima
        statful.sort(key=lambda t: (t[3], t[1]))
        bounds: list = []
        acc = 0
        for i, (_, _, sz, kmin, _) in enumerate(statful):
            if i and acc + sz > self.task_target_bytes:
                bounds.append(kmin)
                acc = 0
            acc += sz
        bounds = sorted(set(bounds))
        if not bounds:
            return single()
        ranges = list(zip([None, *bounds], [*bounds, None]))
        out = []

        def hits(mn, mx, lo, hi):
            if mn is None:
                return True  # stats-less: every range (rows clip inside)
            return (hi is None or mn < hi) and (lo is None or mx >= lo)

        for lo, hi in ranges:
            of = [
                p for s, p, _, mn, mx in metas
                if s == "o" and hits(mn, mx, lo, hi)
            ]
            nf = [
                p for s, p, _, mn, mx in metas
                if s == "n" and hits(mn, mx, lo, hi)
            ]
            if of or nf:
                out.append(_CdfRelDiff(
                    rel, sorted(of), sorted(nf), dv_old, dv_new,
                    positional, lo, hi,
                ))
        return out or single()

    def _change_file_legs(self, s: int, e: int) -> list | None:
        """Per-bucket change-file legs for versions (s, e], or None when
        any version lacks a write-time change descriptor (snapshot-diff
        fallback — full refresh, RESTORE, tables that never opted in).
        All non-empty versions must agree on the bucket count and key, or
        a key's events would straddle tasks and netting would be wrong —
        disagreement falls back to the diff.

        RENAME-AWARE (r12): the rename/drop chain between each version
        and the stream's DECLARED schema is reconstructed from the
        retained manifests (the same metadata walk this planner already
        pays) and rides into each leg as a per-version column-source
        map, so change files written under pre-rename names net
        correctly. Bucket assignment hashes key VALUES, not names, so
        buckets stay aligned across the rename. A rename landing AFTER
        the stream started makes the declared schema stale — that
        raises a restart error, Delta's schema-change rule."""
        import os

        from ..incremental import _feed_column_sources, _rename_ops

        m_s = self._manifest_at(s)
        if m_s is None:
            return None
        mans = [(s, m_s)]
        metas = []
        # walk to at least the stream-start version: era files need every
        # rename between them and the DECLARED schema, including renames
        # in (e, init] when an admission-controlled batch ends early
        for v in range(s + 1, max(e, self._init_version) + 1):
            m = self._manifest_at(v)
            mans.append((v, m or {}))
            if v <= e:
                cdc = (m or {}).get("cdc")
                if cdc is None:
                    return None
                metas.append((v, m or {}, cdc))
        ops = _rename_ops(mans)
        if ops is None:
            return None
        if any(r > self._init_version for r, *_ in ops):
            raise RuntimeError(
                f"{self.model}: a column rename/drop landed after this "
                "stream started — the declared schema is stale; restart "
                "the stream"
            )
        declared = [n for n, _ in self.dtypes]
        srcs: dict[int, dict] = {}
        nonempty = []
        for v, m, c in metas:
            if not c.get("files"):
                continue
            src = _feed_column_sources(
                [n for n, _ in (m.get("dtypes") or [])], v, ops, declared
            )
            if c.get("key") != src.get(self.key):
                return None  # era feed keyed on an untraceable column
            srcs[v] = src
            nonempty.append((v, c))
        if len({int(c["buckets"]) for _, c in nonempty}) > 1:
            return None
        base = os.path.join(self.root, self.model, "_change_data")
        groups: dict[str, list] = {}
        for v, c in nonempty:
            for f in c["files"]:
                bucket = f.split("/", 1)[0]
                groups.setdefault(bucket, []).append(
                    (v, os.path.join(base, c["dir"], f))
                )
        # WRITE-FINE, GROUP-COARSE (VERDICT r10 item 1): pack whole
        # buckets into netting tasks by on-disk byte size — a pure
        # metadata decision (one stat() per change file; change files
        # are change-proportional, so this is cheap even on a deep
        # catch-up). One task's pandas netting is thereby capped at
        # ~task_target_bytes of parquet regardless of churn or version
        # depth; a bucket LARGER than the target still rides alone (the
        # floor is one whole bucket — key locality is the invariant).
        target = self.task_target_bytes
        legs: list = []
        cur_buckets: list = []
        cur_files: list = []
        cur_bytes = 0
        for b, fl in sorted(groups.items()):
            sz = 0
            for _, p in fl:
                try:
                    sz += os.path.getsize(p)
                except OSError:
                    sz += target  # unstat-able: isolate conservatively
            if cur_files and cur_bytes + sz > target:
                legs.append(_CdfChangeBucket(cur_buckets, sorted(cur_files), srcs))
                cur_buckets, cur_files, cur_bytes = [], [], 0
            cur_buckets.append(b)
            cur_files.extend(fl)
            cur_bytes += sz
        if cur_files:
            legs.append(_CdfChangeBucket(cur_buckets, sorted(cur_files), srcs))
        return legs

    def _pa_type(self, tname: str):
        import pyarrow as pa

        t = tname.lower()
        if t.startswith("array<") and t.endswith(">"):
            # embedding-style columns (array<float> etc.) are first-class
            # change-feed citizens — the ANN maintenance consumer needs
            # the row images typed, not stringified
            return pa.list_(self._pa_type(t[6:-1]))
        if t in ("bigint", "long"):
            return pa.int64()
        if t in ("int", "integer"):
            return pa.int32()
        if t in ("smallint", "short"):
            return pa.int16()
        if t in ("double", "float8"):
            return pa.float64()
        if t == "float":
            return pa.float32()
        if t == "boolean":
            return pa.bool_()
        if t == "date":
            return pa.date32()
        if t.startswith("timestamp"):
            return pa.timestamp("us")
        if t.startswith("decimal"):
            import re as _re

            m = _re.match(r"decimal\((\d+),\s*(\d+)\)", t)
            p, s = (int(m.group(1)), int(m.group(2))) if m else (10, 0)
            return pa.decimal128(p, s)
        return pa.string()

    def _emit(self, df, change, rel):
        """pandas rows (data columns) + a constant change type + hive
        partition values -> one arrow batch in declared-schema order."""
        import datetime as dt

        import pyarrow as pa

        n = len(df)
        pvals = {}
        if rel:
            for col, seg in zip(self.partition_by, rel.split("/")):
                pvals[col] = seg.split("=", 1)[1]
        cols, names = [], []
        for cname, tname in self.dtypes:
            typ = self._pa_type(tname)
            if cname in pvals:
                v = pvals[cname]
                if tname == "date":
                    v = dt.date.fromisoformat(v)
                elif pa.types.is_integer(typ):
                    v = int(v)
                cols.append(pa.array([v] * n, typ))
            else:
                # the outer merge NaN-upcasts int columns to float and
                # leaves NaN where None belongs — scrub back to exact
                # values before the typed arrow conversion
                vals = [
                    None
                    if v is None or (isinstance(v, float) and v != v)
                    else (int(v) if pa.types.is_integer(typ) else v)
                    for v in df[cname].tolist()
                ]
                cols.append(pa.array(vals, typ))
            names.append(cname)
        cols.append(pa.array([change] * n, pa.string()))
        names.append("_change_type")
        return pa.RecordBatch.from_arrays(cols, names=names)

    def _diff_emit(self, old, new, cols, rel):
        """Shared four-type emission from pandas (present-before,
        present-after) frames over ``cols`` (key included). Equal rows
        (NaN == NaN) vanish; preimage rows gated on the option."""
        k = self.key
        vcols = [c for c in cols if c != k]
        j = old.merge(
            new, on=k, how="outer", suffixes=("__o", "__n"), indicator=True
        )
        ins = j[j["_merge"] == "right_only"]
        dele = j[j["_merge"] == "left_only"]
        both = j[j["_merge"] == "both"]
        if len(both) and vcols:
            import numpy as np

            def cmpable(s):
                # array-typed cells (embeddings) compare as tuples —
                # elementwise ndarray == would poison the boolean reduce
                return s.map(
                    lambda v: tuple(v)
                    if isinstance(v, (list, np.ndarray))
                    else v
                )

            same = None
            for c in vcols:
                a, b = cmpable(both[f"{c}__o"]), cmpable(both[f"{c}__n"])
                eq = (a == b) | (a.isna() & b.isna())
                same = eq if same is None else (same & eq)
            upd = both[~same]
        else:
            upd = both.iloc[0:0]

        def side(rows, suffix):
            out = rows[[k, *[f"{c}{suffix}" for c in vcols]]].copy()
            out.columns = [k, *vcols]
            return out

        if len(ins):
            yield self._emit(side(ins, "__n"), "insert", rel)
        if len(upd):
            if self.preimages:
                yield self._emit(side(upd, "__o"), "update_preimage", rel)
            yield self._emit(side(upd, "__n"), "update_postimage", rel)
        if len(dele):
            yield self._emit(side(dele, "__o"), "delete", rel)

    def _read_change_bucket(self, part):
        """Net the leg's (whole) key buckets' committed change rows
        across the batch's versions: per key, the FIRST version's
        pre-state vs the LAST version's post-state — identical to the
        snapshot diff, computed from change-proportional bytes (capped
        at ~task_target_bytes by the planner's bucket packing). Change
        rows carry every table column materialized (partition values
        included), so emission needs no rel."""
        import pandas as pd
        import pyarrow.parquet as pq

        allc = [n for n, _ in self.dtypes]
        frames = []
        for v, path in part.files:
            t = pq.read_table(path).to_pandas()
            src = part.srcs.get(v) if getattr(part, "srcs", None) else None
            if src is not None:
                # rename-aware read: keep ONLY the columns the planner
                # traced to the declared schema (a stale dropped-era
                # column must never be read — it could shadow a
                # post-compact re-add) and alias era names to declared
                keep = {src[c]: c for c in src}
                t = t[[c for c in t.columns if c in keep or c == "_change_type"]]
                t = t.rename(columns=keep)
            # schema evolution: pre-evolution change files NULL-fill
            t = t.reindex(columns=[*allc, "_change_type"])
            t["__v"] = v
            frames.append(t)
        df = pd.concat(frames, ignore_index=True)
        k = self.key
        vmin = df.groupby(k)["__v"].min()
        vmax = df.groupby(k)["__v"].max()
        pre = df[df["_change_type"].isin(("update_preimage", "delete"))]
        post = df[df["_change_type"].isin(("insert", "update_postimage"))]
        # pre-state exists iff the key's FIRST event in the range carries
        # one (update/delete); a first-event insert means absent-before.
        # Symmetrically for the post-state at the key's LAST event.
        old = pre[pre["__v"].values == vmin.reindex(pre[k]).values][allc]
        new = post[post["__v"].values == vmax.reindex(post[k]).values][allc]
        yield from self._diff_emit(old, new, allc, "")

    def read(self, part):
        import pandas as pd
        import pyarrow.parquet as pq

        if isinstance(part, _CdfChangeBucket):
            yield from self._read_change_bucket(part)
            return

        data_cols = [
            c for c, _ in self.dtypes if c not in set(self.partition_by)
        ]

        def load(files, pmap=None, ren=None) -> "pd.DataFrame":
            frames = []
            for f in files:
                t = pq.read_table(f).to_pandas()
                # positional vector: drop tombstoned row ordinals of THIS
                # file (pandas default index == in-file ordinal here)
                dead = (pmap or {}).get(f)
                if dead:
                    t = t[~t.index.isin(dead)]
                frames.append(t)
            if not frames:
                return pd.DataFrame(columns=data_cols)
            df = pd.concat(frames, ignore_index=True)
            if ren:
                # pending column mapping (bootstrap leg): committed files
                # carry physical names — alias to logical before the
                # declared-schema reindex
                df = df.rename(columns=ren)
            # schema evolution: older files may lack evolved columns —
            # NULL-fill via reindex against the committed dtypes
            return df.reindex(columns=data_cols)

        k = self.key
        if isinstance(part, _CdfSnapshotInsert):
            ren = getattr(part, "ren", None)
            if part.positional:
                df = load([part.path], _dv_pos_map(part.dv_new), ren)
            else:
                df = load([part.path], None, ren)
                dv = _dv_key_set(part.dv_new)
                if dv:
                    df = df[~df[k].isin(dv)]
            if len(df):
                yield self._emit(df, "insert", part.rel)
            return

        if isinstance(part, _CdfDvLeg):
            new_keys = _dv_key_set(part.dv_new) - _dv_key_set(part.dv_old)
            df = load(part.files)
            dead = df[df[k].isin(new_keys)]
            if len(dead):
                yield self._emit(dead, "delete", part.rel)
            return

        lo = getattr(part, "key_lo", None)
        hi = getattr(part, "key_hi", None)

        def clip(df):
            # key-range sub-task (oversized rel diff): the planner
            # assigned only intersecting FILES; rows outside the range
            # belong to a sibling task
            if lo is not None:
                df = df[df[k] >= lo]
            if hi is not None:
                df = df[df[k] < hi]
            return df

        if getattr(part, "positional", False):
            # positional vector, unchanged across the range (the planner
            # raised otherwise): both snapshots read through the SAME
            # (file, ordinal) map — per-file, inside the task
            pmap = _dv_pos_map(part.dv_new)
            yield from self._diff_emit(
                clip(load(part.old_files, pmap)),
                clip(load(part.new_files, pmap)),
                data_cols,
                part.rel,
            )
            return

        dv_s = _dv_key_set(part.dv_old)
        dv_e = _dv_key_set(part.dv_new)
        new_dv = dv_e - dv_s
        old = clip(load(part.old_files))
        new = clip(load(part.new_files))
        # live state on each side: read through the respective vector;
        # newly-DV'd keys are excluded here (the DV leg reports them, the
        # same anti-join split as batch table_changes)
        if dv_s:
            old = old[~old[k].isin(dv_s)]
        if new_dv:
            old = old[~old[k].isin(new_dv)]
        if dv_e:
            new = new[~new[k].isin(dv_e)]
        yield from self._diff_emit(old, new, data_cols, part.rel)


class ManifestCDFDataSource(DataSource):
    @classmethod
    def name(cls):
        return "mycarely_manifest_cdf"

    def schema(self):
        cur = _manifest_json(
            self.options["root"],
            self.options["model"],
            _manifest_current_version(
                self.options["root"], self.options["model"]
            ),
        )
        if cur is None or not cur.get("dtypes"):
            raise RuntimeError(
                "manifest CDF source needs a committed target with dtypes"
            )
        return (
            ", ".join(f"`{n}` {t}" for n, t in cur["dtypes"])
            + ", `_change_type` string"
        )

    def streamReader(self, schema):
        return ManifestCDFStreamReader(self.options)


def register_manifest_cdf_source(spark) -> None:
    spark.dataSource.register(ManifestCDFDataSource)


# ---------------------------------------------------------------------------
# Python Data Source WRITER (r7): the write half of the extension API.
# Executors write uniquely-named UNCOMMITTED JSONL files and return their
# names as commit messages; the driver's commit() publishes a manifest
# listing exactly the task files (one atomic os.replace — the same
# pointer-swap philosophy as the incremental runner), abort() deletes the
# orphans. A reader that resolves the manifest never sees a torn write:
# task retries/speculation leave only unreferenced garbage.
# ---------------------------------------------------------------------------

from dataclasses import dataclass as _dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@_dataclass
class _SinkCommit(WriterCommitMessage):
    filename: str
    rows: int


class JsonSinkWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        name = f"task-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _SinkCommit(filename=name, rows=n)

    def commit(self, messages):
        import json
        import os

        files = sorted(m.filename for m in messages if m is not None)
        total = sum(m.rows for m in messages if m is not None)
        tmp = os.path.join(self.path, "._MANIFEST.tmp")
        with open(tmp, "w") as fh:
            json.dump({"files": files, "rows": total}, fh)
        os.replace(tmp, os.path.join(self.path, "_MANIFEST"))

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class JsonSinkDataSource(DataSource):
    @classmethod
    def name(cls):
        return "mycarely_json_sink"

    def writer(self, schema, overwrite):
        return JsonSinkWriter(self.options, overwrite)


def register_json_sink(spark) -> None:
    spark.dataSource.register(JsonSinkDataSource)


def sink_committed_files(path: str) -> list[str]:
    """Resolve the sink's committed file list (readers' one chokepoint)."""
    import json
    import os

    with open(os.path.join(path, "_MANIFEST")) as fh:
        m = json.load(fh)
    return [os.path.join(path, f) for f in m["files"]]


def q_pyds_ledger_rollup(spark, sf_dir: str):
    """Read the custom Python data source in parallel partitions and roll
    up per account — the oracle re-derives the generator arithmetically
    (UNNEST(range(n))), so a partition-boundary bug (dropped/duplicated
    range edge) flips the hash."""
    from pyspark.sql import functions as F

    register_ledger_source(spark)
    df = (
        spark.read.format("mycarely_ledger")
        .option("n_rows", DEFAULT_ROWS)
        .option("n_parts", DEFAULT_PARTS)
        .load()
    )
    return (
        df.groupBy("account_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("amount_cents").cast("long").alias("total_cents"),
            F.max("day").alias("last_day"),
        )
    )


O_PYDS_ROLLUP = f"""
WITH g AS (
    SELECT i AS row_id, i % 97 AS account_id,
           (i * i) % 10000 AS amount_cents,
           DATE '2024-01-01' + CAST(i % 90 AS INT) AS day
    FROM UNNEST(range(0, {DEFAULT_ROWS})) AS u(i)
)
SELECT account_id, COUNT(*) AS n_rows,
       CAST(SUM(amount_cents) AS BIGINT) AS total_cents,
       MAX(day) AS last_day
FROM g GROUP BY account_id
"""


def q_pyds_pushdown_slice(spark, sf_dir: str):
    """The same source under a row_id range predicate — the filter is
    ACCEPTED by pushFilters (rows outside [2000, 3000) are never
    generated; test_pyds_pushdown pins the narrowed partition planning),
    and the result must still match the oracle's post-filter arithmetic."""
    from pyspark.sql import functions as F

    register_ledger_source(spark)
    df = (
        spark.read.format("mycarely_ledger")
        .option("n_rows", DEFAULT_ROWS)
        .load()
        .filter((F.col("row_id") >= 2000) & (F.col("row_id") < 3000))
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("amount_cents").cast("long").alias("total_cents"),
        F.min("row_id").alias("first_row"),
        F.max("row_id").alias("last_row"),
    )


O_PYDS_PUSHDOWN = """
WITH g AS (
    SELECT i AS row_id, (i * i) % 10000 AS amount_cents
    FROM UNNEST(range(2000, 3000)) AS u(i)
)
SELECT COUNT(*) AS n_rows, CAST(SUM(amount_cents) AS BIGINT) AS total_cents,
       MIN(row_id) AS first_row, MAX(row_id) AS last_row
FROM g
"""


def q_pyds_incremental_rollup(spark, sf_dir: str):
    """The extension surface composing with the ENGINE, not just a SELECT
    (VERDICT r6 item 7): the Python data source feeds a two-batch
    incremental model — scan → aggregate → manifest-committed target,
    watermark read back from the target's manifest stats, second batch
    merged by unique_key. The modeler translates the date watermark into
    the source's pushable row_id domain (bucket b covers row_id
    [b*250, (b+1)*250)), so the incremental re-scan is narrowed INSIDE
    ``pushFilters`` — rows before the watermark are never generated at
    all, the generator-source equivalent of watermark-pruned file
    skipping."""
    import datetime as dt
    import tempfile

    from pyspark.sql import functions as F

    from ..incremental import IncrementalRunner, ModelSpec

    register_ledger_source(spark)
    epoch = dt.date(2024, 1, 1)

    def build(n_rows: int):
        def b(sp, sfd, wm):
            src = (
                sp.read.format("mycarely_ledger")
                .option("n_rows", n_rows)
                .load()
            )
            if wm is not None:
                src = src.filter(
                    F.col("row_id") >= ((wm - epoch).days + 1) * 250
                )
            return (
                src.withColumn(
                    "bucket_day",
                    F.date_add(
                        F.lit(epoch), F.floor(F.col("row_id") / 250).cast("int")
                    ),
                )
                .groupBy("bucket_day")
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum("amount_cents").cast("long").alias("sum_cents"),
                )
            )

        return b

    def spec(n_rows: int) -> ModelSpec:
        return ModelSpec(
            "pyds_ledger_rollup", "bucket_day", "bucket_day", build(n_rows)
        )

    root = tempfile.mkdtemp(prefix="mycarely_q_pyds_inc_")
    runner = IncrementalRunner(spark, root)
    runner.run(spec(6000), sf_dir)  # batch 1: CTAS, buckets 0-23
    runner.run(spec(DEFAULT_ROWS), sf_dir)  # batch 2: merge buckets 24-39
    return runner.read_target("pyds_ledger_rollup").orderBy("bucket_day")


O_PYDS_INCREMENTAL = f"""
WITH g AS (
    SELECT i AS row_id, (i * i) % 10000 AS amount_cents
    FROM UNNEST(range(0, {DEFAULT_ROWS})) AS u(i)
)
SELECT DATE '2024-01-01' + CAST(row_id // 250 AS INT) AS bucket_day,
       COUNT(*) AS n_rows,
       CAST(SUM(amount_cents) AS BIGINT) AS sum_cents
FROM g GROUP BY 1 ORDER BY 1
"""


def q_pyds_manifest_stream(spark, sf_dir: str):
    """Stream a manifest-committed target through the manifest-tailing
    streaming source (r7): three incremental runs append successive day
    partitions (new partitions only — append-only history), then a
    readStream over the target resolves its input from the manifest
    version diff and must reproduce the full table. The aggregate of the
    STREAMED rows is compared against the generator-side oracle."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..incremental import IncrementalRunner, ModelSpec

    epoch = "2024-01-01"

    def build(n):
        def b(sp, sfd, wm):
            rows = sp.range(n).select(
                F.col("id").alias("k"),
                F.date_add(
                    F.lit(epoch).cast("date"),
                    F.floor(F.col("id") / 100).cast("int"),
                ).alias("day"),
                ((F.col("id") * F.col("id")) % 1000).alias("v"),
            )
            if wm is not None:
                rows = rows.filter(F.col("day") > F.lit(wm))
            return rows

        return b

    root = tempfile.mkdtemp(prefix="mycarely_q_pyds_stream_")
    runner = IncrementalRunner(spark, root)
    for n in (200, 400, 600):
        runner.run(
            ModelSpec(
                "day_rollup", "k", "day", build(n), partition_by=["day"]
            ),
            sf_dir,
        )

    register_manifest_stream_source(spark)
    stream = (
        spark.readStream.format("mycarely_manifest_stream")
        .option("root", root)
        .option("model", "day_rollup")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("manifest_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 300)
    from ..util import materialize

    out = materialize(
        spark.table("manifest_stream_out")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("v").cast("long").alias("sum_v"),
        )
        .orderBy("day")
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


O_PYDS_MANIFEST_STREAM = """
WITH g AS (
    SELECT i AS k, DATE '2024-01-01' + CAST(i // 100 AS INT) AS day,
           (i * i) % 1000 AS v
    FROM UNNEST(range(0, 600)) AS u(i)
)
SELECT day, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v
FROM g GROUP BY day ORDER BY day
"""


def q_pyds_sink_roundtrip(spark, sf_dir: str):
    """Write an exact-integer orders rollup through the Python-writer
    sink (executor task files -> driver manifest commit), then read back
    ONLY the manifest-committed files — the value roundtrip proves both
    halves of the writer protocol against the plain SQL rollup."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from .registry import register_sources

    register_sources(spark, sf_dir)
    register_json_sink(spark)
    rollup = (
        spark.table("orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_custkey").cast("long").alias("sum_cust"),
        )
    )
    base = tempfile.mkdtemp(prefix="mycarely_q_sink_")
    path = f"{base}/out"
    rollup.write.format("mycarely_json_sink").option("path", path).mode(
        "append"
    ).save()
    back = spark.read.schema(
        "o_orderstatus string, n_orders bigint, sum_cust bigint"
    ).json(sink_committed_files(path))
    from ..util import materialize

    out = materialize(back.orderBy("o_orderstatus"))
    shutil.rmtree(base, ignore_errors=True)
    return out


O_PYDS_SINK = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q_medallion_multihop(spark, sf_dir: str):
    """Multi-hop (medallion) streaming pipeline, exactly-once across BOTH
    hops (VERDICT r7 item 5): a committed BRONZE target streams — via the
    manifest-tailing source — into a SILVER incremental model whose
    commits stream into a GOLD rollup.

        bronze (3 incremental day-partition appends, deterministic rows)
          --readStream(manifest)--> silver (filter + transform, keyed
              merge through the partition-pruned incremental writer)
          --readStream(manifest)--> gold (per-day rollup, re-aggregated
              from the silver SNAPSHOT for the touched days, merged by day)

    Exactly-once machinery on display: each hop's offsets are manifest
    VERSIONS persisted in a Spark streaming checkpoint, so the three
    interleaved bronze->silver->gold waves each move only the version
    delta; the final REPLAY wave (both hops re-run on their checkpoints
    with no new data, then gold's sink re-applied) is a no-op — the merge
    is idempotent by key, which is what makes micro-batch redelivery
    safe. Both intermediate histories stay append-only (silver merges
    only ever ADD day partitions here), which the manifest source itself
    enforces — a rewriting commit would raise, not silently replay.

    Scale shape: the stream moves only manifest version diffs (file
    lists), gold recomputes only the touched days from the pruned silver
    read — per-wave cost is delta-proportional at any table size."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..incremental import IncrementalRunner, ModelSpec

    epoch = "2024-01-01"
    root = tempfile.mkdtemp(prefix="mycarely_medallion_")
    runner = IncrementalRunner(spark, root)
    register_manifest_stream_source(spark)

    def bronze_build(n):
        def b(sp, sfd, wm):
            rows = sp.range(n).select(
                F.col("id").alias("k"),
                F.date_add(
                    F.lit(epoch).cast("date"),
                    F.floor(F.col("id") / 100).cast("int"),
                ).alias("day"),
                ((F.col("id") * F.col("id")) % 1000).alias("v"),
            )
            if wm is not None:
                rows = rows.filter(F.col("day") > F.lit(wm))
            return rows

        return b

    silver_spec = ModelSpec(
        "medallion_silver", "k", "day", build=None, partition_by=["day"]
    )
    gold_spec = ModelSpec(
        "medallion_gold", "day", "day", build=None, partition_by=["day"]
    )

    def hop1():
        stream = (
            spark.readStream.format("mycarely_manifest_stream")
            .option("root", root)
            .option("model", "medallion_bronze")
            .load()
        )
        silver = stream.filter(F.col("v") % 3 != 0).select(
            "k", "day", ((F.col("v") * 3) % 101).alias("v2")
        )

        def sink(batch_df, bid):
            rows = batch_df.persist()
            try:
                if rows.count():
                    # the txn ledger (batch id as txnVersion) makes the
                    # sink idempotent even if the checkpoint replays a
                    # delivered batch — exactly-once belt AND suspenders
                    runner.merge_txn(
                        silver_spec, rows, app_id="medallion_hop1",
                        txn_version=bid,
                    )
            finally:
                rows.unpersist()

        q = (
            silver.writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{root}/_ckpt_hop1")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 300)

    def hop2():
        stream = (
            spark.readStream.format("mycarely_manifest_stream")
            .option("root", root)
            .option("model", "medallion_silver")
            .load()
        )

        def sink(batch_df, bid):
            days = [r["day"] for r in batch_df.select("day").distinct().collect()]
            if not days:
                return
            # recompute the touched grain from the silver SNAPSHOT (robust
            # to a day straddling micro-batches), pruned to those days
            agg = (
                runner.read_target("medallion_silver")
                .filter(F.col("day").isin(days))
                .groupBy("day")
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum("v2").cast("long").alias("sum_v2"),
                )
            )
            runner.merge_txn(
                gold_spec, agg, app_id="medallion_hop2", txn_version=bid
            )

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{root}/_ckpt_hop2")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 300)

    for n in (200, 400, 600):
        runner.run(
            ModelSpec(
                "medallion_bronze", "k", "day", bronze_build(n),
                partition_by=["day"],
            ),
            sf_dir,
        )
        hop1()
        hop2()
    # replay wave: no new bronze commits — both hops must be no-ops
    v_silver = runner.current_manifest("medallion_silver")["version"]
    v_gold = runner.current_manifest("medallion_gold")["version"]
    hop1()
    hop2()
    assert runner.current_manifest("medallion_silver")["version"] == v_silver
    assert runner.current_manifest("medallion_gold")["version"] == v_gold

    from ..util import materialize

    out = materialize(
        runner.read_target("medallion_gold")
        .select("day", "n_rows", "sum_v2")
        .orderBy("day")
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


O_MEDALLION = """
WITH g AS (
    SELECT i AS k, DATE '2024-01-01' + CAST(i // 100 AS INT) AS day,
           (i * i) % 1000 AS v
    FROM UNNEST(range(0, 600)) AS u(i)
),
s AS (
    SELECT k, day, (v * 3) % 101 AS v2 FROM g WHERE v % 3 <> 0
)
SELECT day, COUNT(*) AS n_rows, CAST(SUM(v2) AS BIGINT) AS sum_v2
FROM s GROUP BY day ORDER BY day
"""


def q_streaming_cdf_propagate(spark, sf_dir: str):
    """DELETE/UPDATE propagation END TO END through the change-feed
    streaming source (VERDICT r8 item 5): a silver table follows a
    bronze table's inserts, row-level UPDATEs, copy-on-write DELETEs and
    deletion-vector DELETEs — automatically, via one streaming hop.

        bronze: append wave -> UPDATE (cow) -> DELETE (cow) -> append
                wave -> DELETE (mode="dv", metadata-only)
          --readStream(mycarely_manifest_cdf)--> tagged change rows
          --foreachBatch--> tombstone merge into silver (deletes ride
                spec.tombstone_col; txn ledger makes redelivery a no-op)

    The append-only manifest source RAISES on all three mutating commit
    shapes (pinned in tests) — this source streams them as
    insert/update_postimage/delete rows diffed between LIVE snapshot
    states, exactly batch table_changes semantics. The final silver
    state must equal bronze's live state, which the oracle derives
    arithmetically. A replay wave on the same checkpoint is asserted a
    no-op (offsets + txn ledger)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..incremental import IncrementalRunner, ModelSpec

    epoch = "2024-01-01"
    root = tempfile.mkdtemp(prefix="mycarely_cdfprop_")
    runner = IncrementalRunner(spark, root)
    register_manifest_cdf_source(spark)

    def bronze_build(n):
        def b(sp, sfd, wm):
            rows = sp.range(n).select(
                F.col("id").alias("k"),
                F.date_add(
                    F.lit(epoch).cast("date"),
                    F.floor(F.col("id") / 100).cast("int"),
                ).alias("day"),
                ((F.col("id") * F.col("id")) % 1000).alias("v"),
            )
            if wm is not None:
                rows = rows.filter(F.col("day") > F.lit(wm))
            return rows

        return b

    bronze_spec = ModelSpec(
        "cdf_bronze", "k", "day", bronze_build(300), partition_by=["day"],
        # write-time change files (r10): every mutating bronze commit
        # also commits its change rows, so the steady-state hops below
        # stream pure `_change_data/` reads — no snapshot diffed
        change_data=True, cdc_buckets=16,
    )
    silver_spec = ModelSpec(
        "cdf_silver", "k", "day", None, partition_by=["day"],
        tombstone_col="__del",
    )

    def hop():
        stream = (
            spark.readStream.format("mycarely_manifest_cdf")
            .option("root", root)
            .option("model", "cdf_bronze")
            .option("key", "k")
            .load()
        )

        def sink(batch_df, bid):
            rows = batch_df.persist()
            try:
                if rows.count():
                    apply = rows.select(
                        "k", "day", "v",
                        (F.col("_change_type") == "delete").alias("__del"),
                    )
                    runner.merge_txn(
                        silver_spec, apply, app_id="cdf_hop", txn_version=bid
                    )
            finally:
                rows.unpersist()

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{root}/_ckpt_cdf")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 300)

    import dataclasses

    runner.run(bronze_spec, sf_dir)                      # insert wave 1
    hop()
    runner.update_where(bronze_spec, "k % 11 = 5", {"v": "v + 5000"})
    hop()                                                # update_postimage
    runner.delete_where(bronze_spec, "k % 7 = 3")        # cow DELETE
    hop()
    runner.run(                                          # insert wave 2
        dataclasses.replace(bronze_spec, build=bronze_build(600)), sf_dir
    )
    hop()
    runner.delete_where(bronze_spec, "k % 13 = 4", mode="dv")  # DV DELETE
    hop()
    # replay wave: no new bronze commits — checkpoint offsets and the
    # txn ledger both make this a no-op
    v_silver = runner.current_manifest("cdf_silver")["version"]
    hop()
    assert runner.current_manifest("cdf_silver")["version"] == v_silver

    from ..util import materialize

    out = materialize(
        runner.read_target("cdf_silver").orderBy("k")
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


O_CDF_PROPAGATE = """
WITH g AS (
    SELECT i AS k, DATE '2024-01-01' + CAST(i // 100 AS INT) AS day,
           CASE WHEN i < 300 AND i % 11 = 5 THEN (i * i) % 1000 + 5000
                ELSE (i * i) % 1000 END AS v
    FROM UNNEST(range(0, 600)) AS u(i)
)
SELECT k, day, v FROM g
WHERE NOT (k < 300 AND k % 7 = 3) AND NOT (k % 13 = 4)
ORDER BY k
"""


def q_streaming_ivm_aggregate(spark, sf_dir: str):
    """Exact INCREMENTAL VIEW MAINTENANCE over the four-type change feed
    (r9): a gold aggregate `(day, n_rows, sum_v)` maintained purely from
    signed CDF deltas — insert/update_postimage contribute +1/+v,
    delete/update_preimage contribute -1/-v (the preimage row is what
    makes subtraction EXACT; a post-only feed cannot reconstruct the old
    value). Unlike the medallion gold hop (which recomputes touched days
    from the silver SNAPSHOT), the IVM sink never re-reads the base
    table: per batch it reads only the pruned gold slice for the touched
    days, applies the additive deltas, and tombstones days whose count
    reaches zero — per-batch cost is change-proportional at any base
    size, the classic IVM economics for additive aggregates.

    Waves: bootstrap insert -> cow UPDATE (v mutates: -old +new) -> cow
    DELETE -> FULL-DAY delete (drives a gold count to zero -> tombstone)
    -> second insert wave; replay wave asserted a no-op (checkpoint
    offsets + txn ledger). Final gold must equal the groupBy over live
    bronze, which the oracle derives arithmetically — integer-exact, so
    any double-count or missed preimage flips the hash."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..incremental import IncrementalRunner, ModelSpec

    epoch = "2024-01-01"
    root = tempfile.mkdtemp(prefix="mycarely_ivm_")
    runner = IncrementalRunner(spark, root)
    register_manifest_cdf_source(spark)

    def bronze_build(n):
        def b(sp, sfd, wm):
            rows = sp.range(n).select(
                F.col("id").alias("k"),
                F.date_add(
                    F.lit(epoch).cast("date"),
                    F.floor(F.col("id") / 100).cast("int"),
                ).alias("day"),
                ((F.col("id") * F.col("id")) % 1000).alias("v"),
            )
            if wm is not None:
                rows = rows.filter(F.col("day") > F.lit(wm))
            return rows

        return b

    bronze_spec = ModelSpec(
        "ivm_bronze", "k", "day", bronze_build(300), partition_by=["day"],
        # r10: the IVM deltas stream off write-time change files
        # (cdc_buckets sized to the 300-row fixture — r15, guide §6)
        change_data=True, cdc_buckets=16,
    )
    gold_spec = ModelSpec(
        "ivm_gold", "day", "day", None, partition_by=["day"],
        tombstone_col="__del",
    )

    def hop():
        stream = (
            spark.readStream.format("mycarely_manifest_cdf")
            .option("root", root)
            .option("model", "ivm_bronze")
            .option("key", "k")
            .option("preimages", "true")
            .load()
        )

        def sink(batch_df, bid):
            rows = batch_df.persist()
            try:
                if not rows.count():
                    return
                sgn = F.when(
                    F.col("_change_type").isin("insert", "update_postimage"),
                    F.lit(1),
                ).otherwise(F.lit(-1))
                delta = (
                    rows.select("day", "v", sgn.alias("sgn"))
                    .groupBy("day")
                    .agg(
                        F.sum("sgn").cast("long").alias("dn"),
                        F.sum(F.col("v") * F.col("sgn")).cast("long").alias("dv"),
                    )
                )
                # bounded collect: one row per TOUCHED day (the batch's
                # change footprint), the same metadata-scale list the
                # medallion hop collects
                days = sorted(r["day"] for r in delta.select("day").collect())
                if runner.current_manifest("ivm_gold") is not None:
                    cur = runner.read_target(
                        "ivm_gold",
                        prune={"day": (str(days[0]), str(days[-1]))},
                    ).filter(F.col("day").isin(days))
                    delta = delta.join(cur, "day", "left")
                else:
                    delta = delta.select(
                        "day", "dn", "dv",
                        F.lit(None).cast("long").alias("n_rows"),
                        F.lit(None).cast("long").alias("sum_v"),
                    )
                apply = delta.select(
                    "day",
                    (F.coalesce("n_rows", F.lit(0)) + F.col("dn"))
                    .cast("long")
                    .alias("n_rows"),
                    (F.coalesce("sum_v", F.lit(0)) + F.col("dv"))
                    .cast("long")
                    .alias("sum_v"),
                ).withColumn("__del", F.col("n_rows") == 0)
                runner.merge_txn(
                    gold_spec, apply, app_id="ivm", txn_version=bid
                )
            finally:
                rows.unpersist()

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{root}/_ckpt_ivm")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 300)

    import dataclasses

    runner.run(bronze_spec, sf_dir)                      # insert wave 1
    hop()
    runner.update_where(bronze_spec, "k % 11 = 5", {"v": "v + 5000"})
    hop()                                                # -old +new
    runner.delete_where(bronze_spec, "k % 7 = 3")        # cow DELETE
    hop()
    runner.delete_where(bronze_spec, "day = DATE '2024-01-01'")
    hop()                                                # day-1 -> zero -> tombstone
    runner.run(                                          # insert wave 2
        dataclasses.replace(bronze_spec, build=bronze_build(600)), sf_dir
    )
    hop()
    v_gold = runner.current_manifest("ivm_gold")["version"]
    hop()                                                # replay: no-op
    assert runner.current_manifest("ivm_gold")["version"] == v_gold

    from ..util import materialize

    out = materialize(
        runner.read_target("ivm_gold")
        .select("day", "n_rows", "sum_v")
        .orderBy("day")
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


O_IVM_AGG = """
WITH g AS (
    SELECT i AS k, DATE '2024-01-01' + CAST(i // 100 AS INT) AS day,
           CASE WHEN i < 300 AND i % 11 = 5 THEN (i * i) % 1000 + 5000
                ELSE (i * i) % 1000 END AS v
    FROM UNNEST(range(0, 600)) AS u(i)
),
live AS (
    SELECT * FROM g
    WHERE NOT (k < 300 AND k % 7 = 3) AND k >= 100
)
SELECT day, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v
FROM live GROUP BY day ORDER BY day
"""


def q_streaming_ivm_join(spark, sf_dir: str):
    """Exact INCREMENTAL VIEW MAINTENANCE of a two-table JOIN (r11) —
    the delta-join algebra (ΔJ = ΔF ⋈ D' ∪ F' ⋈ ΔD) on top of the
    four-type change feed, completing the IVM story past additive
    aggregates (`streaming_ivm_aggregate`): a materialized view
    `mv = fact ⋈ dim` keyed by the fact key follows BOTH base tables
    through ONE streaming query — the two `mycarely_manifest_cdf`
    sources union into a single tagged feed, so a microbatch carries
    either side's (or both sides') netted changes.

    Per batch the sink recomputes exactly the AFFECTED SLICE:

        K = keys(ΔF) ∪ keys(F' ⋉ cks(ΔD))     -- fact keys whose MV row
                                                -- could have changed
        new = (F' ⋉ K) ⋈ D'                     -- fresh rows for K
        apply = K ⟕ new                          -- unmatched → tombstone

    and merges it with the idempotent txn ledger. Both probe sets (ΔF
    keys, ΔD keys) are change-proportional and broadcast; the one
    base-side read the algebra genuinely requires (F' ⋉ ΔD — Delta/DBSP
    pay it too) is a semi-join a ck-partitioned fact or secondary index
    would prune further. MV rows whose dim row disappears tombstone via
    the merge's delete split — the view never keeps a dangling join row.

    Waves: bootstrap both tables -> dim cow UPDATE (seg re-labels flow
    to every joined row) -> fact cow UPDATE (amt AND the join key ck
    move) + fact cow DELETE caught up by ONE hop (netted two-version
    range; rows hit by both net to a delete) -> dim cow DELETE (ck=3)
    and a fact insert wave landing in the SAME microbatch (existing
    ck=3 join rows tombstone while the simultaneous ck=3 inserts find
    no dim and stay out) -> replay hop asserted a zero-commit no-op. Final MV hash-matches the join over the final live states of
    both tables, derived arithmetically in the oracle — integer-exact,
    so one stale or dangling row flips the hash."""
    import dataclasses
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..incremental import IncrementalRunner, ModelSpec
    from ..util import materialize

    root = tempfile.mkdtemp(prefix="mycarely_ivmj_")
    runner = IncrementalRunner(spark, root)
    # the mutate hop catches up TWO fact commits at once — the
    # consumer's lag is covered by the AGE retention window (r12),
    # RETAIN_VERSIONS at the engine default
    runner.RETENTION_SECONDS = 3600.0
    register_manifest_cdf_source(spark)

    def fact_build(n):
        def b(sp, sfd, wm):
            rows = sp.range(n).select(
                F.col("id").alias("k"),
                (F.col("id") % 20).alias("ck"),
                ((F.col("id") * F.col("id")) % 1000).alias("amt"),
                (F.col("id") % 8).alias("kb"),
            )
            if wm is not None:
                rows = rows.filter(F.col("k") > F.lit(wm))
            return rows

        return b

    def dim_build(sp, sfd, wm):
        rows = sp.range(20).select(
            F.col("id").alias("ck"), (F.col("id") % 5).alias("seg")
        )
        if wm is not None:
            rows = rows.filter(F.col("ck") > F.lit(wm))
        return rows

    fact_spec = ModelSpec(
        "ivmj_fact", "k", "k", fact_build(300), partition_by=["kb"],
        change_data=True, cdc_buckets=16,
    )
    dim_spec = ModelSpec(
        "ivmj_dim", "ck", "ck", dim_build, change_data=True, cdc_buckets=16
    )
    mv_spec = ModelSpec(
        "ivmj_mv", "k", "k", None, partition_by=["kb"], tombstone_col="__del",
    )

    def cdf(model):
        return (
            spark.readStream.format("mycarely_manifest_cdf")
            .option("root", root)
            .option("model", model)
            .option("key", "k" if model == "ivmj_fact" else "ck")
            .option("preimages", "true")
            .load()
        )

    def hop():
        fs = cdf("ivmj_fact").select(
            "k", "ck", F.lit("fact").alias("_src"), "_change_type"
        )
        ds = cdf("ivmj_dim").select(
            F.lit(None).cast("long").alias("k"), "ck",
            F.lit("dim").alias("_src"), "_change_type",
        )
        stream = fs.unionByName(ds)
        batches: list = []

        def sink(batch_df, bid):
            batches.append(bid)
            rows = batch_df.persist()
            try:
                if not rows.count():
                    return
                fc_keys = (
                    rows.filter(F.col("_src") == "fact")
                    .select("k").distinct()
                )
                d_cks = (
                    rows.filter(F.col("_src") == "dim")
                    .select("ck").distinct()
                )
                fact = runner.read_target("ivmj_fact")
                dim = runner.read_target("ivmj_dim")
                k_dim = fact.join(F.broadcast(d_cks), "ck", "semi").select("k")
                keys = fc_keys.unionByName(k_dim).distinct()
                new = (
                    fact.join(F.broadcast(keys), "k", "semi")
                    .join(dim, "ck", "inner")
                    .select("k", "ck", "amt", "seg")
                )
                apply = keys.join(new, "k", "left").select(
                    "k", "ck", "amt", "seg",
                    (F.col("k") % 8).alias("kb"),
                    F.col("ck").isNull().alias("__del"),
                )
                runner.merge_txn(
                    mv_spec, apply, app_id="ivmj", txn_version=bid
                )
            finally:
                rows.unpersist()

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{root}/_ckpt_ivmj")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 300)
        # CURRENT-state contract (ADVICE r12): the sink reads the bases'
        # CURRENT snapshot, which equals batch-end state ONLY when the
        # whole catch-up lands in one microbatch — never set
        # maxVersionsPerBatch on this stream. Pinned per hop:
        assert len(batches) <= 1, batches

    runner.run(fact_spec, sf_dir)                        # bootstrap both
    runner.run(dim_spec, sf_dir)
    hop()                                                # MV = full join
    runner.update_where(dim_spec, "ck % 4 = 1", {"seg": "seg + 10"})
    hop()                                                # F' ⋈ ΔD arm
    runner.update_where(                                 # join key MOVES
        fact_spec, "k % 9 = 2",
        {"amt": "amt + 5000", "ck": "(ck + 7) % 20"},
    )
    runner.delete_where(fact_spec, "k % 13 = 4")         # cow DELETE
    hop()                                                # one netted catch-up
    runner.delete_where(dim_spec, "ck = 3")              # dangling rows out
    runner.run(                                          # insert wave 2
        dataclasses.replace(fact_spec, build=fact_build(600)), sf_dir
    )
    hop()  # BOTH sources in one microbatch: existing ck=3 rows tombstone
    #        and the simultaneous ck=3 inserts find no dim and stay out
    v_mv = runner.current_manifest("ivmj_mv")["version"]
    hop()                                                # replay: no-op
    assert runner.current_manifest("ivmj_mv")["version"] == v_mv

    out = materialize(
        runner.read_target("ivmj_mv")
        .select("k", "ck", "amt", "seg")
        .orderBy("k")
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


O_IVM_JOIN = """
WITH f0 AS (
    SELECT i AS k, i % 20 AS ck, (i * i) % 1000 AS amt
    FROM UNNEST(range(0, 600)) AS u(i)
),
f1 AS (
    -- the cow UPDATE then cow DELETE hit only the bootstrap rows (k<300);
    -- wave-2 inserts (k>=300) arrived after both and are raw
    SELECT k,
           CASE WHEN k < 300 AND k % 9 = 2 THEN (ck + 7) % 20 ELSE ck END
               AS ck,
           CASE WHEN k < 300 AND k % 9 = 2 THEN amt + 5000 ELSE amt END
               AS amt
    FROM f0
    WHERE NOT (k < 300 AND k % 13 = 4)
),
d1 AS (
    SELECT ck,
           CASE WHEN ck % 4 = 1 THEN seg + 10 ELSE seg END AS seg
    FROM (
        SELECT i AS ck, i % 5 AS seg FROM UNNEST(range(0, 20)) AS u(i)
    )
    WHERE ck <> 3
)
SELECT f1.k AS k, f1.ck AS ck, f1.amt AS amt, d1.seg AS seg
FROM f1 JOIN d1 USING (ck)
ORDER BY k
"""


def q_streaming_ivm_join_pruned(spark, sf_dir: str):
    """The IVM-join with its base-side probes PARTITION-PRUNED (r12 —
    VERDICT r11 item 4): `q_streaming_ivm_join` partitions the fact by
    a k-derived bucket, so the F' ⋉ cks(ΔD) probe scans the WHOLE fact
    on every dim-churn batch — fine at sf0.1, dominant at 100 TB under
    a high-churn dim. Here the fact is partitioned by the JOIN-KEY
    bucket `ckb = ck % 4` (the ck-partitioned fact the r11 docstring
    named), and the sink derives the touched bucket set from the
    CHANGE ROWS themselves — a pure metadata decision:

        dim probe:  rels = {ckb=ck%4 : ck ∈ ΔD}      (change-proportional)
        key probe:  rels = buckets of every ck seen in ΔF images
                    ∪ the dim-probe slice's buckets   (exact: the netted
                    post-image IS the key's F' state, so its bucket is
                    known without reading F')

    Both reads go through `read_target(rels=...)` — the manifest
    resolves ONLY matching hive partitions' files, asserted in-entry on
    the dim-only wave: the probe opened exactly the one `ckb=1` rel
    (cks 1,5,9,13,17 all ≡ 1 mod 4) of the 4 committed, every input
    file path under it. The fact UPDATE wave moves ck AND ckb, proving
    copy-on-write DML migrates rows across hive partitions. Same waves,
    same final state, same oracle as the unpruned entry — layout is not
    allowed to change semantics."""
    import dataclasses
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..incremental import IncrementalRunner, ModelSpec
    from ..util import materialize

    root = tempfile.mkdtemp(prefix="mycarely_ivmjp_")
    runner = IncrementalRunner(spark, root)
    # consumer lag covered by AGE retention (r12 item 5) — no per-entry
    # RETAIN_VERSIONS hand-bump
    runner.RETENTION_SECONDS = 3600.0
    register_manifest_cdf_source(spark)

    def fact_build(n):
        def b(sp, sfd, wm):
            rows = sp.range(n).select(
                F.col("id").alias("k"),
                (F.col("id") % 20).alias("ck"),
                ((F.col("id") * F.col("id")) % 1000).alias("amt"),
                ((F.col("id") % 20) % 4).alias("ckb"),
            )
            if wm is not None:
                rows = rows.filter(F.col("k") > F.lit(wm))
            return rows

        return b

    def dim_build(sp, sfd, wm):
        rows = sp.range(20).select(
            F.col("id").alias("ck"), (F.col("id") % 5).alias("seg")
        )
        if wm is not None:
            rows = rows.filter(F.col("ck") > F.lit(wm))
        return rows

    fact_spec = ModelSpec(
        "ivmjp_fact", "k", "k", fact_build(300), partition_by=["ckb"],
        change_data=True, cdc_buckets=16,
    )
    dim_spec = ModelSpec(
        "ivmjp_dim", "ck", "ck", dim_build, change_data=True, cdc_buckets=16
    )
    mv_spec = ModelSpec(
        "ivmjp_mv", "k", "k", None, partition_by=["kb"], tombstone_col="__del",
    )
    pruned_log: list = []  # (n_rels_read, n_rels_committed, files_ok)

    def cdf(model):
        return (
            spark.readStream.format("mycarely_manifest_cdf")
            .option("root", root)
            .option("model", model)
            .option("key", "k" if model == "ivmjp_fact" else "ck")
            .option("preimages", "true")
            .load()
        )

    def hop():
        fs = cdf("ivmjp_fact").select(
            "k", "ck", F.lit("fact").alias("_src"), "_change_type"
        )
        ds = cdf("ivmjp_dim").select(
            F.lit(None).cast("long").alias("k"), "ck",
            F.lit("dim").alias("_src"), "_change_type",
        )
        stream = fs.unionByName(ds)
        batches: list = []

        def sink(batch_df, bid):
            batches.append(bid)
            rows = batch_df.persist()
            try:
                if not rows.count():
                    return
                # change-proportional driver-side key/bucket sets (the
                # dim is broadcast-scale; fact keys are this batch's
                # netted changes)
                f_rows = rows.filter(F.col("_src") == "fact")
                d_cks = [
                    r["ck"]
                    for r in rows.filter(F.col("_src") == "dim")
                    .select("ck").distinct().collect()
                ]
                f_cks = [
                    r["ck"]
                    for r in f_rows.select("ck").distinct().collect()
                ]
                fc_keys = f_rows.select("k").distinct()
                dim = runner.read_target("ivmjp_dim")
                committed = sorted(
                    runner.current_manifest("ivmjp_fact")["partitions"]
                )
                # dim-churn probe: only the partitions that can hold a
                # changed ck — resolved from the manifest, no scan
                d_rels = sorted({f"ckb={ck % 4}" for ck in d_cks})
                if d_cks:
                    fslice = runner.read_target("ivmjp_fact", rels=d_rels)
                    if not f_cks:  # dim-only batch: pin the pruning
                        files = fslice.inputFiles()
                        pruned_log.append((
                            len(d_rels),
                            len(committed),
                            bool(files)
                            and all(
                                any(f"/{r}/" in f for r in d_rels)
                                for f in files
                            ),
                        ))
                    d_cks_df = (
                        rows.filter(F.col("_src") == "dim")
                        .select("ck").distinct()
                    )
                    k_dim = fslice.join(
                        F.broadcast(d_cks_df), "ck", "semi"
                    ).select("k")
                    keys = fc_keys.unionByName(k_dim).distinct()
                else:
                    keys = fc_keys
                # key probe: every candidate key's current bucket is
                # known from the change images (fact side) or the
                # pruned slice (dim side) — union of both bucket sets
                k_rels = sorted(
                    {f"ckb={ck % 4}" for ck in f_cks}
                    | set(d_rels if d_cks else [])
                )
                fact = runner.read_target("ivmjp_fact", rels=k_rels)
                new = (
                    fact.join(F.broadcast(keys), "k", "semi")
                    .join(dim, "ck", "inner")
                    .select("k", "ck", "amt", "seg")
                )
                apply = keys.join(new, "k", "left").select(
                    "k", "ck", "amt", "seg",
                    (F.col("k") % 8).alias("kb"),
                    F.col("ck").isNull().alias("__del"),
                )
                runner.merge_txn(
                    mv_spec, apply, app_id="ivmjp", txn_version=bid
                )
            finally:
                rows.unpersist()

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{root}/_ckpt_ivmjp")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 300)
        # CURRENT-state contract (ADVICE r12): the sink's probes read the
        # bases' CURRENT snapshot = batch-end state only under single-batch
        # availableNow catch-up — never set maxVersionsPerBatch here.
        assert len(batches) <= 1, batches

    runner.run(fact_spec, sf_dir)                        # bootstrap both
    runner.run(dim_spec, sf_dir)
    hop()                                                # MV = full join
    runner.update_where(dim_spec, "ck % 4 = 1", {"seg": "seg + 10"})
    hop()                                                # dim-only: pruned
    runner.update_where(                                 # join key + ckb MOVE
        fact_spec, "k % 9 = 2",
        {"amt": "amt + 5000", "ck": "(ck + 7) % 20",
         "ckb": "((ck + 7) % 20) % 4"},
    )
    runner.delete_where(fact_spec, "k % 13 = 4")         # cow DELETE
    hop()                                                # one netted catch-up
    runner.delete_where(dim_spec, "ck = 3")              # dangling rows out
    runner.run(                                          # insert wave 2
        dataclasses.replace(fact_spec, build=fact_build(600)), sf_dir
    )
    hop()  # BOTH sources in one microbatch
    # the dim-only wave read exactly ONE of the 4 committed ckb rels
    # (ck%4=1 for every changed ck), every input file under it
    assert pruned_log == [(1, 4, True)], pruned_log

    out = materialize(
        runner.read_target("ivmjp_mv")
        .select("k", "ck", "amt", "seg")
        .orderBy("k")
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def q_streaming_ivm_minmax(spark, sf_dir: str):
    """Exact IVM for NON-ADDITIVE aggregates (r12 — completes the IVM
    family: additive counters -> joins -> extrema): a materialized view
    `(g, m_min, m_max, n)` maintained off the four-type feed. MIN/MAX
    cannot be maintained by signed deltas alone — deleting the row that
    CARRIES a group's extreme forces a look at the remaining rows. The
    sink therefore splits every touched group per batch:

      CHEAP (no base read):  n_new from signed counts; insert-only or
        strictly-interior removals (d_min > m_min AND d_max < m_max)
        extend extremes monotonically: min(m_min, i_min)/max(m_max,
        i_max). First-seen groups aggregate the batch directly.
        n_new == 0 tombstones the group with NO read (the counts know).
      RECOMPUTE (pruned base read): a removed value TOUCHES a stored
        extreme (d_min <= m_min OR d_max >= m_max — conservative under
        duplicate values, the correct direction): re-aggregate ONLY
        those groups from the base, read through
        `read_target(rels=[gb=...])` — the g-bucket partitioning makes
        the recompute a partition-pruned scan, so the arm costs
        O(touched groups' buckets), never a base scan. This split is
        exactly how DBSP/Materialize treat non-commutative monoids:
        additive where algebra allows, bounded recompute where it
        doesn't.

    Touched-group stats collect to the driver per batch — change-
    proportional, the same bounded pattern as the touched-day lists.
    Waves: bootstrap -> insert wave raising maxima (asserted CHEAP:
    zero base files read) -> netted UPDATE+DELETE catch-up hitting
    extremes (asserted RECOMPUTE with a pruned rel subset) -> full-
    group delete (tombstone with no read) -> replay no-op. Final MV
    hash-matches the groupBy over the live base, derived arithmetically
    by the oracle — integer-exact."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..incremental import IncrementalRunner, ModelSpec
    from ..util import materialize

    root = tempfile.mkdtemp(prefix="mycarely_ivmx_")
    runner = IncrementalRunner(spark, root)
    runner.RETENTION_SECONDS = 3600.0
    register_manifest_cdf_source(spark)

    def base_build(n):
        def b(sp, sfd, wm):
            rows = sp.range(n).select(
                F.col("id").alias("k"),
                (F.col("id") % 50).alias("g"),
                (
                    (F.col("id") * F.col("id")) % 997
                    + F.when(
                        (F.col("id") >= 400) & (F.col("id") % 3 == 0), 1500
                    ).otherwise(0)
                ).alias("x"),
                ((F.col("id") % 50) % 8).alias("gb"),
            )
            if wm is not None:
                rows = rows.filter(F.col("k") > F.lit(wm))
            return rows

        return b

    base_spec = ModelSpec(
        "ivmx_base", "k", "k", base_build(400), partition_by=["gb"],
        change_data=True, cdc_buckets=16,
    )
    mv_spec = ModelSpec("ivmx_mv", "g", "g", None, tombstone_col="__del")
    path_log: list = []  # ("cheap"|"recompute", rels_read, rels_committed)
    batches: list = []

    def hop():
        hop_start = len(batches)
        feed = (
            spark.readStream.format("mycarely_manifest_cdf")
            .option("root", root)
            .option("model", "ivmx_base")
            .option("key", "k")
            .option("preimages", "true")
            .load()
        )

        def sink(batch_df, bid):
            # CURRENT-state contract, enforced BEFORE work (VERDICT r13
            # item 4): a second batch in one hop means the probes below
            # would read batch-end state for a mid-stream batch — refuse
            # at the top of batch 2, with batch 1 fully committed.
            if len(batches) - hop_start >= 1:
                raise RuntimeError(
                    "IVM CURRENT-state contract violated: more than one "
                    "batch per availableNow hop (maxVersionsPerBatch?)"
                )
            batches.append(bid)
            rows = batch_df.persist()
            try:
                if not rows.count():
                    return
                pre = rows.filter(
                    F.col("_change_type").isin("update_preimage", "delete")
                ).select("g", "x")
                post = rows.filter(
                    F.col("_change_type").isin("insert", "update_postimage")
                ).select("g", "x")
                st = (
                    post.groupBy("g").agg(
                        F.min("x").alias("i_min"),
                        F.max("x").alias("i_max"),
                        F.count("*").alias("i_n"),
                    )
                    .join(
                        pre.groupBy("g").agg(
                            F.min("x").alias("d_min"),
                            F.max("x").alias("d_max"),
                            F.count("*").alias("d_n"),
                        ),
                        "g",
                        "full",
                    )
                )
                if runner.target_exists("ivmx_mv"):
                    st = st.join(
                        runner.read_target("ivmx_mv").select(
                            "g", "m_min", "m_max", "n"
                        ),
                        "g",
                        "left",
                    )
                else:
                    st = st.select(
                        "*",
                        F.lit(None).cast("bigint").alias("m_min"),
                        F.lit(None).cast("bigint").alias("m_max"),
                        F.lit(None).cast("bigint").alias("n"),
                    )
                # touched-group stats: change-proportional, driver-bounded
                cheap, recompute = [], []
                for r in st.collect():
                    n_old = r["n"] or 0
                    i_n, d_n = r["i_n"] or 0, r["d_n"] or 0
                    n_new = n_old + i_n - d_n
                    if n_new == 0:
                        # counts prove the group is gone — tombstone, no read
                        cheap.append((r["g"], 0, 0, 0, True))
                    elif n_old == 0:
                        cheap.append(
                            (r["g"], r["i_min"], r["i_max"], n_new, False)
                        )
                    elif d_n and (
                        r["d_min"] <= r["m_min"] or r["d_max"] >= r["m_max"]
                    ):
                        # a removed value touches a stored extreme —
                        # the one case extrema algebra cannot absorb
                        recompute.append(r["g"])
                    else:
                        m_min = (
                            min(r["m_min"], r["i_min"]) if i_n else r["m_min"]
                        )
                        m_max = (
                            max(r["m_max"], r["i_max"]) if i_n else r["m_max"]
                        )
                        cheap.append((r["g"], m_min, m_max, n_new, False))
                out = spark.createDataFrame(
                    cheap,
                    "g bigint, m_min bigint, m_max bigint, n bigint, "
                    "__del boolean",
                )
                if recompute:
                    rels = sorted({f"gb={g % 8}" for g in recompute})
                    committed = sorted(
                        runner.current_manifest("ivmx_base")["partitions"]
                    )
                    path_log.append(("recompute", rels, committed))
                    gset = spark.createDataFrame(
                        [(g,) for g in recompute], "g bigint"
                    )
                    rec = (
                        runner.read_target("ivmx_base", rels=rels)
                        .join(F.broadcast(gset), "g", "semi")
                        .groupBy("g")
                        .agg(
                            F.min("x").alias("m_min"),
                            F.max("x").alias("m_max"),
                            F.count("*").alias("n"),
                        )
                        .select(
                            "g", "m_min", "m_max", "n",
                            F.lit(False).alias("__del"),
                        )
                    )
                    out = out.unionByName(rec)
                else:
                    path_log.append(("cheap", [], []))
                runner.merge_txn(
                    mv_spec, out, app_id="ivmx", txn_version=bid
                )
            finally:
                rows.unpersist()

        q = (
            feed.writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{root}/_ckpt_ivmx")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 300)
        # CURRENT-state contract (ADVICE r12): both the MV probe and the
        # recompute arm read CURRENT state = batch-end state only under
        # single-batch availableNow catch-up — never set
        # maxVersionsPerBatch here. Pinned per hop:
        assert len(batches) - hop_start <= 1, batches

    runner.run(base_spec, sf_dir)                          # v1 bootstrap
    hop()                                                  # MV = full agg
    runner.run(                                            # insert wave
        __import__("dataclasses").replace(
            base_spec, build=base_build(600)
        ),
        sf_dir,
    )
    hop()                                                  # cheap path
    runner.update_where(base_spec, "k % 97 = 5", {"x": "x + 2000"})
    runner.delete_where(base_spec, "k % 101 = 7")
    hop()                                                  # netted: extrema hit
    runner.delete_where(base_spec, "g = 13")               # whole group out
    hop()                                                  # tombstone, no read
    v_mv = runner.current_manifest("ivmx_mv")["version"]
    hop()                                                  # replay: no-op
    assert runner.current_manifest("ivmx_mv")["version"] == v_mv
    # the insert wave stayed on the cheap path; the extrema-hitting
    # catch-up recomputed through a PRUNED rel subset
    kinds = [k for k, _, _ in path_log]
    assert kinds[1] == "cheap", path_log
    assert "recompute" in kinds[2:], path_log
    for k, rels, committed in path_log:
        if k == "recompute":
            assert rels and set(rels) <= set(committed), (rels, committed)

    out = materialize(
        runner.read_target("ivmx_mv")
        .select("g", "m_min", "m_max", "n")
        .orderBy("g")
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def q_streaming_ivm_distinct(spark, sf_dir: str):
    """Exact IVM for COUNT DISTINCT (r13 — VERDICT r12 item 1): the
    reference's own flagship aggregate — `traffic_pages_agg`'s
    `unique_visits` IS a per-day COUNT(DISTINCT domain_userid)
    (reference models/traffic_pages_agg.sql:33) — maintained off the
    four-type change feed WITHOUT re-aggregating any base day.

    COUNT DISTINCT is neither additive nor extendable-monotone: a
    delete of a user's LAST event for a day must decrement the day's
    distinct count, which no signed counter over the feed alone can
    know. The exact auxiliary state (DBSP / pre-aggregated support
    multiset) is per-(day, user) SUPPORT COUNTS — a keyed manifest
    table, exactly the signature-index shape:

      insert/update_postimage   -> support += 1
      delete/update_preimage    -> support -= 1
      support 0 -> positive     -> day's uniq_n += 1
      support positive -> 0     -> day's uniq_n -= 1 (row tombstoned)
      day's total_n hits 0      -> MV row tombstoned

    Netting handles update pre/postimage pairs arithmetically (a user
    updated in place nets to delta 0 and never probes). BOTH state
    probes are PARTITION-PRUNED from the change rows alone: support
    and MV are day-bucket-partitioned (gb = g % 8) and each batch
    derives its probe footprint as `read_target(rels=[gb=...])` from
    the touched days — manifest-only file selection, the minmax
    recompute arm's discipline. The base table is NEVER read by the
    sink; per-batch work is change-proportional (touched-day stats
    collect driver-side, the bounded touched-day-list pattern; the
    per-(day,user) support updates stay distributed).

    Crash ordering: the MV merge commits BEFORE the support merge —
    both carry the same (app_id, txn_version), so a replay after a
    partial failure recomputes transitions from the still-unchanged
    support and the already-applied merge skips via the txn ledger;
    writing support first would make a replayed batch compute
    transitions from post-state. Waves: bootstrap -> insert wave (new
    users raise uniq_n, repeat users only total_n) -> netted
    UPDATE+DELETE catch-up (updates MOVE users across values: uniq
    increments AND decrements in one batch; deletes drop a last event
    -> uniq_n decrement, and non-last events -> support-only
    decrement) -> full-day delete (MV + every support row tombstone,
    probe asserted to open exactly 1 of 8 committed buckets) ->
    replay no-op. Final MV hash-matches the batch
    COUNT(*)/COUNT(DISTINCT) GROUP BY oracle — integer-exact."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..incremental import IncrementalRunner, ModelSpec
    from ..util import materialize

    root = tempfile.mkdtemp(prefix="mycarely_ivmd_")
    runner = IncrementalRunner(spark, root)
    runner.RETENTION_SECONDS = 3600.0
    register_manifest_cdf_source(spark)

    def base_build(n):
        def b(sp, sfd, wm):
            rows = sp.range(n).select(
                F.col("id").alias("k"),
                (F.col("id") % 40).alias("g"),
                ((F.col("id") * F.col("id")) % 23).alias("u"),
                ((F.col("id") % 40) % 8).alias("gb"),
            )
            if wm is not None:
                rows = rows.filter(F.col("k") > F.lit(wm))
            return rows

        return b

    base_spec = ModelSpec(
        "ivmd_base", "k", "k", base_build(500), partition_by=["gb"],
        change_data=True,
        # change-file bucket count sized to THIS table (r15, guide §6
        # small files): the 256-bucket scale default made every 500-row
        # commit write ~250 near-empty bucket files (one per non-empty
        # hash bucket) that each CDF hop then re-opened. Constant per
        # table lifetime, as the netting contract requires; a 100 TB
        # table keeps the default.
        cdc_buckets=16,
    )
    sup_spec = ModelSpec(
        "ivmd_sup", "sk", "sk", None, partition_by=["gb"],
        tombstone_col="__del",
    )
    mv_spec = ModelSpec(
        "ivmd_mv", "g", "g", None, partition_by=["gb"],
        tombstone_col="__del",
    )
    # per batch: (probe rels, committed sup rels, uniq increments,
    # uniq decrements) — the change-proportional audit trail
    path_log: list = []
    batches: list = []

    def hop():
        hop_start = len(batches)
        feed = (
            spark.readStream.format("mycarely_manifest_cdf")
            .option("root", root)
            .option("model", "ivmd_base")
            .option("key", "k")
            .option("preimages", "true")
            .load()
        )

        def sink(batch_df, bid):
            # CURRENT-state contract, enforced BEFORE work (VERDICT r13
            # item 4): a second batch in one hop means the probes below
            # would read batch-end state for a mid-stream batch — refuse
            # at the top of batch 2, with batch 1 fully committed.
            if len(batches) - hop_start >= 1:
                raise RuntimeError(
                    "IVM CURRENT-state contract violated: more than one "
                    "batch per availableNow hop (maxVersionsPerBatch?)"
                )
            batches.append(bid)
            rows = batch_df.persist()
            try:
                if not rows.count():
                    return
                # signed per-(day, user) delta; in-place updates net to 0
                delta = (
                    rows.select(
                        "g", "u",
                        F.when(
                            F.col("_change_type").isin(
                                "insert", "update_postimage"
                            ),
                            F.lit(1),
                        ).otherwise(F.lit(-1)).alias("d"),
                    )
                    .groupBy("g", "u")
                    .agg(F.sum("d").alias("d"))
                    .filter(F.col("d") != 0)
                    .persist()
                )
                touched = sorted(
                    r["g"] for r in delta.select("g").distinct().collect()
                )
                if not touched:
                    return
                rels = sorted({f"gb={g % 8}" for g in touched})
                committed = (
                    sorted(runner.current_manifest("ivmd_sup")["partitions"])
                    if runner.target_exists("ivmd_sup")
                    else []
                )
                # support probe: ONLY the touched days' buckets, resolved
                # from the manifest (no scan); the base is never read
                if committed:
                    old_sup = runner.read_target("ivmd_sup", rels=rels).select(
                        "g", "u", "s"
                    )
                else:
                    old_sup = delta.select("g", "u").limit(0).select(
                        "g", "u", F.lit(0).cast("bigint").alias("s")
                    )
                j = delta.join(old_sup, ["g", "u"], "left").select(
                    "g", "u", "d",
                    F.coalesce(F.col("s"), F.lit(0)).alias("s_old"),
                    (F.coalesce(F.col("s"), F.lit(0)) + F.col("d")).alias(
                        "s_new"
                    ),
                )
                sup_out = j.select(
                    (F.col("g") * 1000 + F.col("u")).alias("sk"),
                    "g", "u",
                    F.col("s_new").alias("s"),
                    (F.col("g") % 8).alias("gb"),
                    (F.col("s_new") == 0).alias("__del"),
                )
                # foreachBatch redelivery guard (ADVICE r13): if the MV
                # merge for this batch_id already committed (crash
                # between the MV commit and the checkpoint commit), the
                # MV arithmetic below would read POST-merge state and
                # fire the sanity asserts — skip straight to the support
                # merge, idempotent via its own ledger.
                last_mv = (
                    runner.txn_last_version("ivmd_mv", "ivmd_mv")
                    if runner.target_exists("ivmd_mv")
                    else None
                )
                if last_mv is not None and last_mv >= bid:
                    runner.merge_txn(
                        sup_spec, sup_out, app_id="ivmd_sup", txn_version=bid
                    )
                    delta.unpersist()
                    return
                # touched-day stats: driver-bounded (<= days in the feed)
                stats = {
                    r["g"]: r
                    for r in j.groupBy("g")
                    .agg(
                        F.sum("d").alias("n_delta"),
                        F.sum(
                            F.when(
                                (F.col("s_old") == 0) & (F.col("s_new") > 0),
                                1,
                            ).otherwise(0)
                        ).alias("uinc"),
                        F.sum(
                            F.when(
                                (F.col("s_old") > 0) & (F.col("s_new") == 0),
                                1,
                            ).otherwise(0)
                        ).alias("udec"),
                        F.sum(
                            F.when(F.col("s_new") < 0, 1).otherwise(0)
                        ).alias("neg"),
                    )
                    .collect()
                }
                assert all(r["neg"] == 0 for r in stats.values()), (
                    "negative support — feed and state disagree",
                    stats,
                )
                old_mv = (
                    {
                        r["g"]: r
                        for r in runner.read_target("ivmd_mv", rels=rels)
                        .join(
                            F.broadcast(
                                spark.createDataFrame(
                                    [(g,) for g in touched], "g bigint"
                                )
                            ),
                            "g",
                            "semi",
                        )
                        .collect()
                    }
                    if runner.target_exists("ivmd_mv")
                    else {}
                )
                mv_rows = []
                for g in touched:
                    st = stats[g]
                    o = old_mv.get(g)
                    total_n = (o["total_n"] if o else 0) + st["n_delta"]
                    uniq_n = (o["uniq_n"] if o else 0) + st["uinc"] - st["udec"]
                    assert total_n >= 0 and uniq_n >= 0, (g, total_n, uniq_n)
                    assert (total_n == 0) == (uniq_n == 0), (g, total_n, uniq_n)
                    mv_rows.append((g, total_n, uniq_n, g % 8, total_n == 0))
                path_log.append(
                    (
                        rels,
                        committed,
                        sum(r["uinc"] for r in stats.values()),
                        sum(r["udec"] for r in stats.values()),
                    )
                )
                # MV first, support second (see docstring: replay safety)
                runner.merge_txn(
                    mv_spec,
                    spark.createDataFrame(
                        mv_rows,
                        "g bigint, total_n bigint, uniq_n bigint, "
                        "gb bigint, __del boolean",
                    ),
                    app_id="ivmd_mv",
                    txn_version=bid,
                )
                runner.merge_txn(
                    sup_spec, sup_out, app_id="ivmd_sup", txn_version=bid
                )
                delta.unpersist()
            finally:
                rows.unpersist()

        q = (
            feed.writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{root}/_ckpt_ivmd")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 300)
        # CURRENT-state contract (ADVICE r12): the support/MV probes read
        # CURRENT state = batch-end state only under single-batch
        # availableNow catch-up — never set maxVersionsPerBatch here.
        assert len(batches) - hop_start <= 1, batches

    from ..util import timed_phase

    with timed_phase("bootstrap"):
        runner.run(base_spec, sf_dir)                      # v1 bootstrap
        hop()                                              # MV = full agg
    with timed_phase("wave_insert"):
        runner.run(                                        # insert wave
            __import__("dataclasses").replace(
                base_spec, build=base_build(800)
            ),
            sf_dir,
        )
        hop()                                              # new + repeat users
    with timed_phase("wave_net"):
        runner.update_where(base_spec, "k % 89 = 3", {"u": "(u + 5) % 23"})
        runner.delete_where(base_spec, "k % 37 = 11")
        hop()                                              # netted catch-up
    with timed_phase("wave_day_delete"):
        runner.delete_where(base_spec, "g = 17")           # full-day delete
        hop()                                              # day tombstones
    v_mv = runner.current_manifest("ivmd_mv")["version"]
    with timed_phase("replay"):
        hop()                                              # replay: no-op
    assert runner.current_manifest("ivmd_mv")["version"] == v_mv
    # every probe stayed inside the committed bucket set; the netted
    # catch-up moved uniques BOTH directions; the day-delete wave opened
    # exactly ONE of the 8 committed buckets
    for rels, committed, _, _ in path_log[1:]:
        assert set(rels) <= set(committed), (rels, committed)
    assert path_log[2][2] > 0 and path_log[2][3] > 0, path_log
    assert path_log[3][0] == ["gb=1"] and len(path_log[3][1]) == 8, path_log
    # the day's state is GONE, not zeroed: MV and support both tombstoned
    assert (
        runner.read_target("ivmd_mv").filter(F.col("g") == 17).count() == 0
    )
    assert (
        runner.read_target("ivmd_sup").filter(F.col("g") == 17).count() == 0
    )

    out = materialize(
        runner.read_target("ivmd_mv")
        .select("g", "total_n", "uniq_n")
        .orderBy("g")
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


O_IVM_DISTINCT = """
WITH b AS (
    SELECT i AS k, i % 40 AS g, (i * i) % 23 AS u
    FROM UNNEST(range(0, 800)) AS t(i)
),
u2 AS (
    SELECT k, g, CASE WHEN k % 89 = 3 THEN (u + 5) % 23 ELSE u END AS u
    FROM b
),
f AS (SELECT * FROM u2 WHERE k % 37 <> 11 AND g <> 17)
SELECT g, COUNT(*) AS total_n, COUNT(DISTINCT u) AS uniq_n
FROM f GROUP BY g ORDER BY g
"""


def _mvr_flow(spark, sf_dir: str, make_maintainer):
    """The GENERALIZED IVM engine API end-to-end (r13; fixture shared
    r14 by the SQL-declared twin `sql_create_mv`): one view composing
    every supported aggregate kind — COUNT, SUM, MIN, MAX,
    COUNT DISTINCT — maintained by `MaterializedViewMaintainer.refresh`
    (mycarely_saas_dbt_spark/ivm.py), the engine surface that unifies
    what the four hand-written IVM entries proved strategy-by-strategy
    (additive deltas, the minmax cheap/recompute split, the distinct
    support table). ``make_maintainer(runner)`` binds the definition —
    the hand-built MVDefinition or ivm_sql's parsed CREATE MATERIALIZED
    VIEW. The entry is the USER's flow: declare the view, call
    refresh() after each base commit, read the result — no sink code.

    Waves: bootstrap (asserted ZERO recompute groups — insert-only
    batches stay on the signed-delta path; the insert-extends-extremes
    cheap path on EXISTING groups keeps its oracle via the
    streaming_ivm_minmax sweep entry) -> netted
    UPDATE(x)+UPDATE(u)+DELETE catch-up (moves extremes AND distinct
    supports in one batch; asserted to engage the partition-pruned
    recompute arm) -> whole-group delete (tombstone from counts alone,
    zero recompute) -> replay no-op (version pinned). Every probe's rel
    set is asserted inside the committed bucket set via the
    maintainer's path_log. Final MV hash-matches the five-aggregate
    GROUP BY oracle — integer-exact."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..incremental import IncrementalRunner, ModelSpec
    from ..ivm import MaterializedViewMaintainer, MVAggregate, MVDefinition
    from ..util import materialize

    root = tempfile.mkdtemp(prefix="mycarely_mvr_")
    runner = IncrementalRunner(spark, root)
    runner.RETENTION_SECONDS = 3600.0
    register_manifest_cdf_source(spark)

    def base_build(n):
        def b(sp, sfd, wm):
            rows = sp.range(n).select(
                F.col("id").alias("k"),
                (F.col("id") % 50).alias("g"),
                (
                    (F.col("id") * F.col("id")) % 997
                    + F.when(
                        (F.col("id") >= 400) & (F.col("id") % 3 == 0), 1500
                    ).otherwise(0)
                ).alias("x"),
                ((F.col("id") * 3) % 13).alias("u"),
                ((F.col("id") % 50) % 8).alias("gb"),
            )
            if wm is not None:
                rows = rows.filter(F.col("k") > F.lit(wm))
            return rows

        return b

    base_spec = ModelSpec(
        "mvr_base", "k", "k", base_build(600), partition_by=["gb"],
        change_data=True, cdc_buckets=16,
    )
    runner.run(base_spec, sf_dir)                          # v1 bootstrap
    m = make_maintainer(runner)
    m.refresh(spark)                                       # MV = full agg
    runner.update_where(base_spec, "k % 97 = 5", {"x": "x + 2000"})
    runner.update_where(base_spec, "k % 89 = 3", {"u": "(u + 5) % 13"})
    runner.delete_where(base_spec, "k % 101 = 7")
    m.refresh(spark)                                       # extremes hit
    runner.delete_where(base_spec, "g = 13")               # whole group out
    m.refresh(spark)                                       # tombstone wave
    v_mv = runner.current_manifest("mvr_mv")["version"]
    m.refresh(spark)                                       # replay: no-op
    assert runner.current_manifest("mvr_mv")["version"] == v_mv
    # insert-only stays on signed deltas; the netted catch-up engages
    # the pruned recompute arm; the group tombstone needs no recompute
    recs = [n for _, _, n in m.path_log]
    assert recs[0] == 0 and recs[1] > 0 and recs[2] == 0, m.path_log
    for rels, committed, _ in m.path_log[1:]:
        assert set(rels) <= set(committed), (rels, committed)

    out = materialize(m.read().orderBy("g"))
    shutil.rmtree(root, ignore_errors=True)
    return out


def q_mv_incremental_refresh(spark, sf_dir: str):
    from ..ivm import MaterializedViewMaintainer, MVAggregate, MVDefinition

    def make(runner):
        mv = MVDefinition(
            "mvr_mv", "mvr_base", "k", ["g"],
            [
                MVAggregate("count", None, "n"),
                MVAggregate("sum", "x", "sum_x"),
                MVAggregate("min", "x", "min_x"),
                MVAggregate("max", "x", "max_x"),
                MVAggregate("count_distinct", "u", "uniq_u"),
            ],
            bucket_expr="g % 8", bucket_col="gb",
        )
        return MaterializedViewMaintainer(runner, mv)

    return _mvr_flow(spark, sf_dir, make)


MVR_DDL = """
CREATE MATERIALIZED VIEW mvr_mv
OPTIONS (base_key 'k', bucket_expr 'g % 8', bucket_col 'gb')
AS SELECT g, COUNT(*) AS n, SUM(x) AS sum_x, MIN(x) AS min_x,
          MAX(x) AS max_x, COUNT(DISTINCT u) AS uniq_u
FROM mvr_base
GROUP BY g
"""


def q_sql_create_mv(spark, sf_dir: str):
    """The IVM API's SQL front door end-to-end (r14 — VERDICT r13
    item 7): the SAME fixture, SAME waves, SAME oracle as
    mv_incremental_refresh, with the view declared through

        CREATE MATERIALIZED VIEW ... OPTIONS (base_key ..., bucket_expr
        ..., bucket_col ...) AS SELECT <aggs> FROM <base> GROUP BY <keys>

    parsed by ivm_sql.parse_create_materialized_view into the identical
    MVDefinition — the dbt user's declarative path to the maintainer.
    The parser's refusal matrix (joins / WHERE / HAVING / windows /
    SUM(DISTINCT) / expression group keys / missing aliases) is pinned
    in tests/test_ivm_sql.py; sharing the hand-built entry's oracle is
    the proof the SQL path does not change semantics."""
    from ..ivm_sql import create_materialized_view

    return _mvr_flow(
        spark, sf_dir,
        lambda runner: create_materialized_view(runner, MVR_DDL),
    )


O_MV_REFRESH = """
WITH b AS (
    SELECT i AS k, i % 50 AS g,
           (i * i) % 997
             + CASE WHEN i >= 400 AND i % 3 = 0 THEN 1500 ELSE 0 END AS x,
           (i * 3) % 13 AS u
    FROM UNNEST(range(0, 600)) AS t(i)
),
s1 AS (
    SELECT k, g,
           CASE WHEN k % 97 = 5 THEN x + 2000 ELSE x END AS x,
           CASE WHEN k % 89 = 3 THEN (u + 5) % 13 ELSE u END AS u
    FROM b
),
f AS (SELECT * FROM s1 WHERE k % 101 <> 7 AND g <> 13)
SELECT g, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sum_x,
       MIN(x) AS min_x, MAX(x) AS max_x, COUNT(DISTINCT u) AS uniq_u
FROM f GROUP BY g ORDER BY g
"""


def q_jv_incremental_refresh(spark, sf_dir: str):
    """The generalized IVM engine API's JOIN-VIEW side (r13):
    `JoinViewDefinition` + `JoinViewMaintainer` (ivm.py) maintain a
    fact ⋈ dim row-level view off a UNION of both tables' change feeds —
    the delta-join `streaming_ivm_join_pruned` proved as a hand-written
    sink, now engine surface. SAME fixture, SAME waves, SAME oracle as
    that entry (the API must not change semantics): ck-bucket-partitioned
    fact so BOTH base probes resolve via read_target(rels=...) from the
    change rows alone; the dim-only wave asserts the probe opened exactly
    1 of the 4 committed rels with every input file under it; the fact
    UPDATE wave moves ck AND ckb (copy-on-write DML migrates rows across
    hive partitions); a dim delete tombstones dangling view rows while a
    simultaneous same-key insert wave stays out (both sources in one
    microbatch); replay is a version-pinned no-op."""
    import dataclasses
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..incremental import IncrementalRunner, ModelSpec
    from ..ivm import JoinViewDefinition, JoinViewMaintainer
    from ..util import materialize

    root = tempfile.mkdtemp(prefix="mycarely_jvr_")
    runner = IncrementalRunner(spark, root)
    runner.RETENTION_SECONDS = 3600.0
    register_manifest_cdf_source(spark)

    def fact_build(n):
        def b(sp, sfd, wm):
            rows = sp.range(n).select(
                F.col("id").alias("k"),
                (F.col("id") % 20).alias("ck"),
                ((F.col("id") * F.col("id")) % 1000).alias("amt"),
                ((F.col("id") % 20) % 4).alias("ckb"),
            )
            if wm is not None:
                rows = rows.filter(F.col("k") > F.lit(wm))
            return rows

        return b

    def dim_build(sp, sfd, wm):
        rows = sp.range(20).select(
            F.col("id").alias("ck"), (F.col("id") % 5).alias("seg")
        )
        if wm is not None:
            rows = rows.filter(F.col("ck") > F.lit(wm))
        return rows

    fact_spec = ModelSpec(
        "jvr_fact", "k", "k", fact_build(300), partition_by=["ckb"],
        change_data=True, cdc_buckets=16,
    )
    dim_spec = ModelSpec(
        "jvr_dim", "ck", "ck", dim_build, change_data=True, cdc_buckets=16
    )
    runner.run(fact_spec, sf_dir)                        # bootstrap both
    runner.run(dim_spec, sf_dir)
    jv = JoinViewDefinition(
        "jvr_view", "jvr_fact", "k", "jvr_dim", "ck",
        fact_cols=["amt"], dim_cols=["seg"],
        fact_bucket_expr="ck % 4", fact_bucket_col="ckb",
        view_bucket_expr="k % 8", view_bucket_col="kb",
    )
    m = JoinViewMaintainer(runner, jv)
    m.refresh(spark)                                     # view = full join
    runner.update_where(dim_spec, "ck % 4 = 1", {"seg": "seg + 10"})
    m.refresh(spark)                                     # dim-only: pruned
    runner.update_where(                                 # join key + ckb MOVE
        fact_spec, "k % 9 = 2",
        {"amt": "amt + 5000", "ck": "(ck + 7) % 20",
         "ckb": "((ck + 7) % 20) % 4"},
    )
    runner.delete_where(fact_spec, "k % 13 = 4")         # cow DELETE
    m.refresh(spark)                                     # one netted catch-up
    runner.delete_where(dim_spec, "ck = 3")              # dangling rows out
    runner.run(                                          # insert wave 2
        dataclasses.replace(fact_spec, build=fact_build(600)), sf_dir
    )
    m.refresh(spark)  # BOTH sources in one microbatch
    v_mv = runner.current_manifest("jvr_view")["version"]
    m.refresh(spark)                                     # replay: no-op
    assert runner.current_manifest("jvr_view")["version"] == v_mv
    # the dim-only wave read exactly ONE of the 4 committed ckb rels
    # (ck%4=1 for every changed ck), every input file under it
    dim_only = [
        (rels, committed, ok)
        for rels, committed, ok in m.path_log
        if ok is not None
    ]
    assert dim_only and dim_only[0][2] and len(dim_only[0][0]) == 1, (
        m.path_log
    )
    assert len(dim_only[0][1]) == 4, m.path_log

    out = materialize(m.read().orderBy("k"))
    shutil.rmtree(root, ignore_errors=True)
    return out


# The reference model's filtered-events projection (traffic_pages_agg's
# `filtered_events` CTE — reference models/traffic_pages_agg.sql:7-24),
# engine-portable (runs verbatim in Spark SQL and DuckDB): bot/spider/
# crawl NOT ILIKE ladder with NULL drop, internal-referrer rejection,
# page NOT NULL gate. `db` is the day-of-month bucket the IVM state
# partitions on (derivable from any change row — the pruning key).
TPV_FE_SQL = """
SELECT CAST(event_id AS BIGINT) AS eid,
       CAST(collector_tstamp AS DATE) AS event_date,
       app_id AS company_domain,
       domain_userid, page_urlpath,
       EXTRACT(DAY FROM CAST(collector_tstamp AS DATE)) % 8 AS db
FROM atomic_events
WHERE event = 'page_view' AND refr_medium <> 'internal'
  AND useragent NOT ILIKE '%bot%' AND useragent NOT ILIKE '%spider%'
  AND useragent NOT ILIKE '%crawl%' AND page_urlpath IS NOT NULL
"""


def q_streaming_ivm_traffic_pages(spark, sf_dir: str):
    """Exact IVM of the REFERENCE's flagship aggregate (r13 — ties
    VERDICT r12 item 1 to reference parity): `traffic_pages_agg`'s
    `page_traffic` CTE — per (date, company_domain, page_urlpath)
    COUNT(*) AS traffic and COUNT(DISTINCT domain_userid) AS
    unique_visits (reference models/traffic_pages_agg.sql:27-36) —
    maintained off the four-type change feed of a CDF-enabled
    filtered-events table, WITHOUT re-aggregating any base day.

    This is `streaming_ivm_distinct`'s support-count machinery
    instantiated on the real model shape, with the extra semantics the
    synthetic entry can't show:
      * NULL domain_userid rows (the atomic_events feed has them) count
        toward traffic but NEVER toward unique_visits — they bypass the
        support table entirely, exactly COUNT(DISTINCT)'s NULL rule;
      * the group key is COMPOSITE (date, domain, path) — state keys
        are concat-encoded, the partition bucket (db = day-of-month %
        8) derives from any change row, so both state probes stay
        `read_target(rels=[db=...])`-pruned;
      * per-batch MV arithmetic stays DISTRIBUTED (full-join of total
        deltas, support transitions, and the pruned old-MV slice) —
        only the touched-date list and one sanity aggregate collect.

    Waves: bootstrap (incl. NULL-user rows) -> insert wave (eid%5=4
    backfill) -> netted UPDATE (user reassignment via '_x' suffix —
    uniq increments AND decrements; NULL users stay NULL and net to
    zero) + DELETE (bot purge eid%23=9: last-event deletes decrement
    unique_visits, others only traffic) -> full-BUCKET delete (db=7:
    every group on days 7/15/23/31 tombstones; probe asserted to open
    exactly 1 of 8 committed rels) -> replay no-op. Final MV
    hash-matches the model-shaped GROUP BY oracle over the live rows."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..incremental import IncrementalRunner, ModelSpec
    from ..sources.registry import register_sources
    from ..util import materialize

    register_sources(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="mycarely_ivmtp_")
    runner = IncrementalRunner(spark, root)
    runner.RETENTION_SECONDS = 3600.0
    register_manifest_cdf_source(spark)
    G3 = ["event_date", "company_domain", "page_urlpath"]

    def base_build(pred):
        def b(sp, sfd, wm):
            register_sources(sp, sfd)
            return sp.sql(TPV_FE_SQL).filter(pred)

        return b

    base_spec = ModelSpec(
        "tpv_base", "eid", "eid", base_build("eid % 5 != 4"),
        partition_by=["db"], change_data=True, cdc_buckets=16,
    )
    sup_spec = ModelSpec(
        "tpv_sup", "sk", "sk", None, partition_by=["db"],
        tombstone_col="__del",
    )
    mv_spec = ModelSpec(
        "tpv_mv", "gk", "gk", None, partition_by=["db"],
        tombstone_col="__del",
    )
    path_log: list = []  # (rels, committed, uinc, udec) per batch
    batches: list = []

    def hop():
        hop_start = len(batches)
        feed = (
            spark.readStream.format("mycarely_manifest_cdf")
            .option("root", root)
            .option("model", "tpv_base")
            .option("key", "eid")
            .option("preimages", "true")
            .load()
        )

        def sink(batch_df, bid):
            # CURRENT-state contract, enforced BEFORE work (VERDICT r13
            # item 4): a second batch in one hop means the probes below
            # would read batch-end state for a mid-stream batch — refuse
            # at the top of batch 2, with batch 1 fully committed.
            if len(batches) - hop_start >= 1:
                raise RuntimeError(
                    "IVM CURRENT-state contract violated: more than one "
                    "batch per availableNow hop (maxVersionsPerBatch?)"
                )
            batches.append(bid)
            rows = batch_df.persist()
            try:
                if not rows.count():
                    return
                sign = F.when(
                    F.col("_change_type").isin("insert", "update_postimage"),
                    F.lit(1),
                ).otherwise(F.lit(-1))
                ch = rows.select(*G3, "domain_userid", sign.alias("d"))
                # traffic deltas count EVERY row; support deltas only
                # non-NULL users (COUNT DISTINCT's NULL rule)
                tot = ch.groupBy(*G3).agg(F.sum("d").alias("n_delta"))
                sup_d = (
                    ch.filter(F.col("domain_userid").isNotNull())
                    .groupBy(*G3, "domain_userid")
                    .agg(F.sum("d").alias("d"))
                    .filter(F.col("d") != 0)
                )
                # touched-date list: driver-bounded (<= days in the feed)
                dates = [
                    r["event_date"]
                    for r in tot.select("event_date").distinct().collect()
                ]
                rels = sorted({f"db={d.day % 8}" for d in dates})
                committed = (
                    sorted(runner.current_manifest("tpv_sup")["partitions"])
                    if runner.target_exists("tpv_sup")
                    else []
                )
                if committed:
                    old_sup = runner.read_target("tpv_sup", rels=rels).select(
                        *G3, "domain_userid", "s"
                    )
                else:
                    old_sup = sup_d.limit(0).select(
                        *G3, "domain_userid",
                        F.lit(0).cast("bigint").alias("s"),
                    )
                j = sup_d.join(
                    old_sup, [*G3, "domain_userid"], "left"
                ).select(
                    *G3, "domain_userid", "d",
                    F.coalesce(F.col("s"), F.lit(0)).alias("s_old"),
                    (F.coalesce(F.col("s"), F.lit(0)) + F.col("d")).alias(
                        "s_new"
                    ),
                ).persist()
                sup_out = j.select(
                    F.concat_ws(
                        "|", F.col("event_date").cast("string"),
                        "company_domain", "page_urlpath", "domain_userid",
                    ).alias("sk"),
                    *G3, "domain_userid",
                    F.col("s_new").alias("s"),
                    (F.dayofmonth("event_date") % 8).alias("db"),
                    (F.col("s_new") == 0).alias("__del"),
                )
                # foreachBatch redelivery guard (ADVICE r13): MV already
                # committed for this batch_id => the MV arithmetic below
                # would read POST-merge state and fire the sanity assert;
                # skip to the support merge (ledger-idempotent).
                last_mv = (
                    runner.txn_last_version("tpv_mv", "tpv_mv")
                    if runner.target_exists("tpv_mv")
                    else None
                )
                if last_mv is not None and last_mv >= bid:
                    runner.merge_txn(
                        sup_spec, sup_out, app_id="tpv_sup", txn_version=bid
                    )
                    j.unpersist()
                    return
                trans = j.groupBy(*G3).agg(
                    F.sum(
                        F.when(
                            (F.col("s_old") == 0) & (F.col("s_new") > 0), 1
                        ).otherwise(0)
                    ).alias("uinc"),
                    F.sum(
                        F.when(
                            (F.col("s_old") > 0) & (F.col("s_new") == 0), 1
                        ).otherwise(0)
                    ).alias("udec"),
                    F.sum(
                        F.when(F.col("s_new") < 0, 1).otherwise(0)
                    ).alias("neg"),
                )
                old_mv = (
                    runner.read_target("tpv_mv", rels=rels).select(
                        *G3, "traffic", "unique_visits"
                    )
                    if runner.target_exists("tpv_mv")
                    else tot.limit(0).select(
                        *G3,
                        F.lit(0).cast("bigint").alias("traffic"),
                        F.lit(0).cast("bigint").alias("unique_visits"),
                    )
                )
                z = F.lit(0).cast("bigint")
                # distributed MV arithmetic: touched groups only
                merged = (
                    tot.join(trans, G3, "full")
                    .join(old_mv, G3, "left")
                    .select(
                        *G3,
                        (
                            F.coalesce(F.col("traffic"), z)
                            + F.coalesce(F.col("n_delta"), z)
                        ).alias("traffic"),
                        (
                            F.coalesce(F.col("unique_visits"), z)
                            + F.coalesce(F.col("uinc"), z)
                            - F.coalesce(F.col("udec"), z)
                        ).alias("unique_visits"),
                        F.coalesce(F.col("neg"), z).alias("neg"),
                        F.coalesce(F.col("uinc"), z).alias("uinc"),
                        F.coalesce(F.col("udec"), z).alias("udec"),
                    )
                    .persist()
                )
                sane = merged.agg(
                    F.sum(
                        F.when(
                            (F.col("neg") > 0)
                            | (F.col("traffic") < 0)
                            | (F.col("unique_visits") < 0)
                            | (F.col("unique_visits") > F.col("traffic")),
                            1,
                        ).otherwise(0)
                    ).alias("bad"),
                    F.sum("uinc").alias("ui"),
                    F.sum("udec").alias("ud"),
                ).collect()[0]
                assert sane["bad"] == 0, "IVM state and feed disagree"
                path_log.append((rels, committed, sane["ui"], sane["ud"]))
                mv_out = merged.select(
                    F.concat_ws(
                        "|", F.col("event_date").cast("string"),
                        "company_domain", "page_urlpath",
                    ).alias("gk"),
                    *G3, "traffic", "unique_visits",
                    (F.dayofmonth("event_date") % 8).alias("db"),
                    (F.col("traffic") == 0).alias("__del"),
                )
                # MV first, support second (crash ordering: a replay
                # recomputes from still-unchanged support; the applied
                # merge skips via the txn ledger)
                runner.merge_txn(
                    mv_spec, mv_out, app_id="tpv_mv", txn_version=bid
                )
                runner.merge_txn(
                    sup_spec, sup_out, app_id="tpv_sup", txn_version=bid
                )
                j.unpersist()
                merged.unpersist()
            finally:
                rows.unpersist()

        q = (
            feed.writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{root}/_ckpt_tpv")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 300)
        # CURRENT-state contract (ADVICE r12): single-batch catch-up only
        assert len(batches) - hop_start <= 1, batches

    from ..util import timed_phase

    with timed_phase("bootstrap"):
        runner.run(base_spec, sf_dir)                      # v1 bootstrap
        hop()                                              # MV = full agg
    with timed_phase("wave_insert"):
        runner.run(                                        # insert backfill
            __import__("dataclasses").replace(
                base_spec, build=base_build("eid % 5 = 4")
            ),
            sf_dir,
        )
        hop()
    with timed_phase("wave_net"):
        runner.update_where(                               # user reassignment
            base_spec, "eid % 31 = 5",
            {"domain_userid": "concat(domain_userid, '_x')"},
        )
        runner.delete_where(base_spec, "eid % 23 = 9")     # bot purge
        hop()                                              # netted catch-up
    with timed_phase("wave_bucket_delete"):
        runner.delete_where(base_spec, "db = 7")           # whole bucket out
        hop()                                              # tombstone wave
    v_mv = runner.current_manifest("tpv_mv")["version"]
    with timed_phase("replay"):
        hop()                                              # replay: no-op
    assert runner.current_manifest("tpv_mv")["version"] == v_mv
    for rels, committed, _, _ in path_log[1:]:
        assert set(rels) <= set(committed), (rels, committed)
    # the netted catch-up moved uniques BOTH directions; the bucket
    # delete opened exactly ONE of the 8 committed rels
    assert path_log[2][2] > 0 and path_log[2][3] > 0, path_log
    assert path_log[3][0] == ["db=7"] and len(path_log[3][1]) == 8, path_log
    assert (
        runner.read_target("tpv_mv").filter(F.col("db") == 7).count() == 0
    )

    out = materialize(
        runner.read_target("tpv_mv")
        .select(*G3, "traffic", "unique_visits")
        .orderBy(*G3)
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def _ivm_tp_oracle() -> str:
    from .synthetic import ATOMIC_EVENTS_SQL

    return f"""
WITH atomic_events AS ({ATOMIC_EVENTS_SQL}),
fe AS ({TPV_FE_SQL}),
u2 AS (
    SELECT eid, event_date, company_domain, page_urlpath, db,
           CASE WHEN eid % 31 = 5 THEN domain_userid || '_x'
                ELSE domain_userid END AS domain_userid
    FROM fe
),
f AS (SELECT * FROM u2 WHERE eid % 23 <> 9 AND db <> 7)
SELECT event_date, company_domain, page_urlpath,
       COUNT(*) AS traffic,
       COUNT(DISTINCT domain_userid) AS unique_visits
FROM f GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# --- r14: exact IVM of the REFERENCE's traffic_daily_agg DAG ------------
# The classified-events projection of models/traffic_daily_agg.sql:8-75
# (filtered_events + classified_events + the col_3/col_4 pickers),
# engine-portable (runs verbatim in Spark SQL and DuckDB). `db` is the
# day-of-month bucket the IVM state partitions on.
TDV_CE_SQL = """
WITH fe AS (
    SELECT CAST(event_id AS BIGINT) AS eid,
           CAST(collector_tstamp AS DATE) AS event_date,
           app_id, domain_userid, refr_medium, mkt_source, refr_source,
           mkt_network, mkt_campaign, mkt_term
    FROM atomic_events
    WHERE event = 'page_view' AND refr_medium <> 'internal'
      AND useragent NOT ILIKE '%bot%' AND useragent NOT ILIKE '%spider%'
      AND useragent NOT ILIKE '%crawl%'
),
ce AS (
    SELECT eid, event_date, app_id, domain_userid,
           CASE
               WHEN (refr_medium IN ('cpc', 'ppc', 'paidsearch', 'display',
                                     'social', 'search', 'email', '',
                                     'unknown')
                     AND COALESCE(mkt_network, '') <> '')
                    OR (refr_medium = 'paid') THEN 'paid'
               WHEN refr_medium IN ('display', 'social', 'search', 'email',
                                    '', 'unknown')
                    AND refr_medium <> 'paid'
                    AND COALESCE(mkt_network, '') = '' THEN 'organic'
               ELSE NULL
           END AS traffic_type,
           mkt_source, refr_source, mkt_network, mkt_campaign, mkt_term
    FROM fe
)
SELECT eid, event_date, app_id, domain_userid, traffic_type,
       CASE
           WHEN traffic_type = 'paid'
               THEN COALESCE(mkt_source, refr_source, mkt_network, 'unknown')
           WHEN traffic_type = 'organic'
               THEN COALESCE(mkt_source, refr_source, 'unknown')
       END AS col_3,
       CASE
           WHEN traffic_type = 'paid' THEN COALESCE(mkt_campaign, 'unknown')
           WHEN traffic_type = 'organic'
               THEN COALESCE(mkt_term, mkt_campaign, 'unknown')
       END AS col_4,
       EXTRACT(DAY FROM event_date) % 8 AS db
FROM ce
WHERE traffic_type IS NOT NULL
"""

# campaign_spend_data with a row identity: the synthetic campaign_spends
# derivation (sources/synthetic.py CAMPAIGN_SPENDS_SQL — one row per
# o_orderkey % 5 = 0) re-expressed with `sid = o_orderkey` so the spend
# table can be a change-data dim (its own unique key, independent of the
# fanning (campaign_name, spend_date) join tuple).
TDV_SP_SQL = """
SELECT
    CAST(o_orderkey AS BIGINT)                        AS sid,
    CAST(o_custkey % 3 + 1 AS INT)                    AS company_id,
    'domain' || CAST(o_custkey % 3 AS STRING) || '.example.com'
                                                      AS company_domain,
    CAST('2024-01-01' AS DATE) + CAST(o_orderkey % 31 AS INT) AS spend_date,
    CASE CAST(o_orderkey % 7 AS INT)
         WHEN 0 THEN 'spring_sale'  WHEN 1 THEN 'brand_push'
         WHEN 2 THEN 'summer_promo' WHEN 3 THEN 'holiday2024'
         WHEN 4 THEN 'retarget_q1'  WHEN 5 THEN 'generic_cmp'
         ELSE 'orphan_campaign' END                   AS campaign_name,
    CASE WHEN o_orderkey % 10 = 0 THEN NULL
         WHEN o_orderkey % 10 = 1 THEN CAST(0 AS DOUBLE)
         ELSE CAST(o_orderkey % 400 AS DOUBLE) / 4 END AS spend
FROM orders
WHERE o_orderkey % 5 = 0
"""


def q_ivm_traffic_daily(spark, sf_dir: str):
    """Exact IVM of the reference's ENTIRE traffic_daily_agg DAG (r14 —
    VERDICT r13 item 1): aggregate-then-LEFT-join, maintained end to
    end through the generalized IVM API as a CHAIN of maintainers —

      events --(MVDefinition: COUNT + COUNT DISTINCT, emit_changes)-->
      tdv_et --(JoinViewDefinition: LEFT, composite keys, constant
                ON-predicate traffic_type='paid', dim_filter spend IS
                NOT NULL, dim FAN-OUT)--> tdv_join --> read() applies
      the row-level unpivot + NVL(spend,0) + md5 surrogate key.

    This is the reference's event_traffic CTE (models/
    traffic_daily_agg.sql:51-76) maintained as a COUNT/COUNT DISTINCT
    MV whose change feed drives the combined_traffic LEFT JOIN
    (models/traffic_daily_agg.sql:92-129) as a maintained join view:
      * a paid group with no spend match stays in the view with NULL
        spend (LEFT semantics) and flips in place when a matching
        spend row appears/vanishes;
      * the ON carries the constant predicate et.traffic_type='paid'
        — organic groups NEVER probe the dim and keep NULL spend;
      * (campaign_name, spend_date) FANS OUT (multiple companies spend
        on the same campaign-day) — the view's merge is delete+insert
        by fact key, replacing each affected group's row SET;
      * the spend dim carries its own unique key (sid) for its change
        feed; dim_filter spend IS NOT NULL is part of the definition,
        so a spend update crossing NULL<->value flips match state.

    Waves: bootstrap -> spend-only churn pinned to one day bucket
    (dim-only batch asserted to open EXACTLY 1 of the 8 committed fact
    rels, every input file under it) -> event insert backfill -> netted
    user-reassignment UPDATE + bot-purge DELETE (moves unique_visitors
    both directions through the MV's support table, propagates through
    the join view) -> replay no-op (both targets version-pinned).
    Final read hash-matches the full traffic_daily_agg-shaped oracle
    (id/company/date/traffic/spend/col_1..col_6) over the mutated
    sources — the reference's TD output maintained incrementally."""
    import dataclasses
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..incremental import IncrementalRunner, ModelSpec
    from ..ivm import (
        JoinViewDefinition,
        JoinViewMaintainer,
        MaterializedViewMaintainer,
        MVAggregate,
        MVDefinition,
    )
    from ..functions.dialect import surrogate_key
    from ..sources.registry import register_sources
    from ..util import materialize

    register_sources(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="mycarely_ivmtd_")
    runner = IncrementalRunner(spark, root)
    runner.RETENTION_SECONDS = 3600.0
    register_manifest_cdf_source(spark)

    def ev_build(pred):
        def b(sp, sfd, wm):
            register_sources(sp, sfd)
            return sp.sql(TDV_CE_SQL).filter(pred)

        return b

    def sp_build(sp, sfd, wm):
        register_sources(sp, sfd)
        return sp.sql(TDV_SP_SQL)

    ev_spec = ModelSpec(
        "tdv_ev", "eid", "eid", ev_build("eid % 5 != 4"),
        partition_by=["db"], change_data=True, cdc_buckets=16,
    )
    sp_spec = ModelSpec(
        "tdv_sp", "sid", "sid", sp_build, change_data=True, cdc_buckets=16
    )
    runner.run(ev_spec, sf_dir)
    runner.run(sp_spec, sf_dir)

    mv = MVDefinition(
        "tdv_et", "tdv_ev", "eid",
        ["event_date", "app_id", "traffic_type", "col_3", "col_4"],
        [
            MVAggregate("count", None, "total_visits"),
            MVAggregate("count_distinct", "domain_userid", "unique_visitors"),
        ],
        bucket_expr="extract(DAY FROM event_date) % 8", bucket_col="db",
        emit_changes=True,
    )
    m_et = MaterializedViewMaintainer(runner, mv)
    m_et.refresh(spark)                                   # MV = full agg
    jv = JoinViewDefinition(
        "tdv_join", "tdv_et", "__gk", "tdv_sp",
        join_on=[("col_4", "campaign_name"), ("event_date", "spend_date")],
        fact_cols=[
            "app_id", "traffic_type", "col_3",
            "total_visits", "unique_visitors",
        ],
        dim_cols=["spend"],
        how="left",
        fact_match_pred="traffic_type = 'paid'",
        dim_filter="spend IS NOT NULL",
        dim_key="sid",
        fact_bucket_expr="extract(DAY FROM event_date) % 8",
        fact_bucket_col="db",
        view_bucket_expr="pmod(xxhash64(__gk), 8)", view_bucket_col="vb",
    )
    m_jv = JoinViewMaintainer(runner, jv)
    m_jv.refresh(spark)                                   # view = full join
    # spend-only churn pinned to day-bucket 3: NULL->value flips
    # (dim_filter boundary), value changes, and deletes
    runner.update_where(
        sp_spec, "sid % 13 = 2 AND extract(DAY FROM spend_date) % 8 = 3",
        {"spend": "coalesce(spend, 0) + 250"},
    )
    runner.delete_where(
        sp_spec, "sid % 17 = 6 AND extract(DAY FROM spend_date) % 8 = 3"
    )
    m_jv.refresh(spark)                                   # dim-only: pruned
    runner.run(                                           # insert backfill
        dataclasses.replace(ev_spec, build=ev_build("eid % 5 = 4")), sf_dir
    )
    m_et.refresh(spark)
    m_jv.refresh(spark)
    runner.update_where(                                  # user reassignment
        ev_spec, "eid % 31 = 5",
        {"domain_userid": "concat(domain_userid, '_x')"},
    )
    runner.delete_where(ev_spec, "eid % 23 = 9")          # bot purge
    m_et.refresh(spark)                                   # netted catch-up
    m_jv.refresh(spark)
    v_et = runner.current_manifest("tdv_et")["version"]
    v_jv = runner.current_manifest("tdv_join")["version"]
    m_et.refresh(spark)                                   # replay: no-ops
    m_jv.refresh(spark)
    assert runner.current_manifest("tdv_et")["version"] == v_et
    assert runner.current_manifest("tdv_join")["version"] == v_jv
    # every MV probe stayed inside the committed bucket set
    for rels, committed, _ in m_et.path_log[1:]:
        assert set(rels) <= set(committed), (rels, committed)
    # the dim-only wave opened EXACTLY one of the 8 committed fact rels,
    # every input file under it (manifest-resolved pruning, pinned)
    dim_only = [t for t in m_jv.path_log if t[2] is not None]
    assert dim_only and dim_only[0][2], m_jv.path_log
    assert dim_only[0][0] == ["db=3"], m_jv.path_log
    assert len(dim_only[0][1]) == 8, m_jv.path_log

    # the reference model's tail: UNION-ALL unpivot (single-scan stack)
    # + NVL(spend, 0) + md5 surrogate key — row-level derived SELECT
    # over the maintained view (models/traffic_daily_agg.sql:92-145)
    v = m_jv.read().selectExpr(
        "999 AS company_id",
        "app_id AS company_domain",
        "event_date AS spend_date",
        "CAST(COALESCE(spend, 0) AS DOUBLE) AS spend",
        "traffic_type AS col_2",
        "col_3",
        "col_4",
        "stack(2, 'all', total_visits, 'unique', unique_visitors)"
        " AS (col_1, traffic)",
        "CAST(NULL AS STRING) AS col_5",
        "CAST(NULL AS STRING) AS col_6",
    )
    out = materialize(
        v.select(
            surrogate_key(
                "company_domain", "spend_date", "col_1", "col_2", "col_3",
                "col_4",
            ).alias("id"),
            "company_id", "company_domain", "spend_date", "traffic",
            "spend", "col_1", "col_2", "col_3", "col_4", "col_5", "col_6",
        )
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def _ivm_td_oracle() -> str:
    from ..plans.traffic_daily import _SURROGATE
    from .synthetic import ATOMIC_EVENTS_SQL

    return f"""
WITH atomic_events AS ({ATOMIC_EVENTS_SQL}),
ce AS ({TDV_CE_SQL}),
ev AS (
    SELECT eid, event_date, app_id, traffic_type, col_3, col_4,
           CASE WHEN eid % 31 = 5 THEN domain_userid || '_x'
                ELSE domain_userid END AS domain_userid
    FROM ce WHERE eid % 23 <> 9
),
et AS (
    SELECT event_date, app_id, traffic_type, col_3, col_4,
           COUNT(*) AS total_visits,
           COUNT(DISTINCT domain_userid) AS unique_visitors
    FROM ev GROUP BY 1, 2, 3, 4, 5
),
sp0 AS ({TDV_SP_SQL}),
sp1 AS (
    SELECT sid, company_id, company_domain, spend_date, campaign_name,
           CASE WHEN sid % 13 = 2 AND EXTRACT(DAY FROM spend_date) % 8 = 3
                THEN COALESCE(spend, 0) + 250 ELSE spend END AS spend
    FROM sp0
    WHERE NOT (sid % 17 = 6 AND EXTRACT(DAY FROM spend_date) % 8 = 3)
),
csd AS (SELECT * FROM sp1 WHERE spend IS NOT NULL),
combined AS (
    SELECT 999 AS company_id, et.app_id AS company_domain,
           et.event_date AS spend_date, et.total_visits AS traffic,
           CAST(COALESCE(csd.spend, 0) AS DOUBLE) AS spend,
           'all' AS col_1, et.traffic_type AS col_2, et.col_3, et.col_4,
           CAST(NULL AS STRING) AS col_5, CAST(NULL AS STRING) AS col_6
    FROM et
    LEFT JOIN csd
        ON et.col_4 = csd.campaign_name
        AND et.event_date = csd.spend_date
        AND et.traffic_type = 'paid'
    UNION ALL
    SELECT 999 AS company_id, et.app_id AS company_domain,
           et.event_date AS spend_date, et.unique_visitors AS traffic,
           CAST(COALESCE(csd.spend, 0) AS DOUBLE) AS spend,
           'unique' AS col_1, et.traffic_type AS col_2, et.col_3, et.col_4,
           CAST(NULL AS STRING) AS col_5, CAST(NULL AS STRING) AS col_6
    FROM et
    LEFT JOIN csd
        ON et.col_4 = csd.campaign_name
        AND et.event_date = csd.spend_date
        AND et.traffic_type = 'paid'
)
SELECT __SURROGATE__ AS id,
       company_id, company_domain, spend_date, traffic, spend,
       col_1, col_2, col_3, col_4, col_5, col_6
FROM combined
""".replace("__SURROGATE__", _SURROGATE)


O_IVM_MINMAX = """
WITH b AS (
    SELECT i AS k, i % 50 AS g,
           (i * i) % 997
             + CASE WHEN i >= 400 AND i % 3 = 0 THEN 1500 ELSE 0 END AS x
    FROM UNNEST(range(0, 600)) AS u(i)
),
u AS (
    SELECT k, g, CASE WHEN k % 97 = 5 THEN x + 2000 ELSE x END AS x FROM b
),
f AS (SELECT * FROM u WHERE k % 101 <> 7 AND g <> 13)
SELECT g, MIN(x) AS m_min, MAX(x) AS m_max, COUNT(*) AS n
FROM f GROUP BY g ORDER BY g
"""


def register_queries(register) -> None:
    register("pyds_ledger_rollup", q_pyds_ledger_rollup, O_PYDS_ROLLUP)
    register("pyds_pushdown_slice", q_pyds_pushdown_slice, O_PYDS_PUSHDOWN)
    register(
        "pyds_incremental_rollup", q_pyds_incremental_rollup, O_PYDS_INCREMENTAL
    )
    register(
        "pyds_manifest_stream", q_pyds_manifest_stream, O_PYDS_MANIFEST_STREAM
    )
    register("pyds_sink_roundtrip", q_pyds_sink_roundtrip, O_PYDS_SINK)
    register("medallion_multihop", q_medallion_multihop, O_MEDALLION)
    register(
        "streaming_cdf_propagate", q_streaming_cdf_propagate, O_CDF_PROPAGATE
    )
    register(
        "streaming_ivm_aggregate", q_streaming_ivm_aggregate, O_IVM_AGG
    )
    register("streaming_ivm_join", q_streaming_ivm_join, O_IVM_JOIN)
    # the ck-partitioned fact variant shares the oracle by design:
    # layout must not change semantics
    register(
        "streaming_ivm_join_pruned", q_streaming_ivm_join_pruned, O_IVM_JOIN
    )
    register("streaming_ivm_minmax", q_streaming_ivm_minmax, O_IVM_MINMAX)
    register(
        "streaming_ivm_distinct", q_streaming_ivm_distinct, O_IVM_DISTINCT
    )
    register(
        "streaming_ivm_traffic_pages",
        q_streaming_ivm_traffic_pages,
        _ivm_tp_oracle(),
    )
    register("mv_incremental_refresh", q_mv_incremental_refresh, O_MV_REFRESH)
    # the SQL-declared twin shares the oracle by design: the front door
    # must not change semantics
    register("sql_create_mv", q_sql_create_mv, O_MV_REFRESH)
    register("ivm_traffic_daily", q_ivm_traffic_daily, _ivm_td_oracle())
    # the join-view API twin shares the hand-written entry's oracle by
    # design: the API must not change semantics
    register("jv_incremental_refresh", q_jv_incremental_refresh, O_IVM_JOIN)
