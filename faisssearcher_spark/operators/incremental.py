"""Incremental near-duplicate screening against persisted MinHash state.

The 100 TB curation loop ingests batches continuously; each new batch
must be near-dup-checked against EVERYTHING already ingested without
re-reading or re-hashing the history. The engine already covers the
exact-membership half with a broadcastable Bloom filter
(operators/bloom.py); this module is the NEAR-dup half: a persisted
store of banded MinHash signatures that each new batch equi-joins
against.

Why signatures, not shingle sets: exact-Jaccard verification (the
``minhash_lsh_join`` discipline) needs both documents' shingle sets —
storing those is corpus-sized. The store keeps only the ``num_hashes``
-slot signature (~128 B/doc at 16 hashes), and screening scores each
banded candidate with the SIGNATURE-ESTIMATED Jaccard: the fraction of
agreeing signature slots, an unbiased estimator of the true Jaccard
with variance J(1−J)/num_hashes (resolution 1/num_hashes — at 16
hashes a 0.7 threshold really means "estimate ≥ 0.6875"). Every
arithmetic step is the engine-standard per-slot salted-md5 MinHash,
so the whole screen — signatures, bands, candidate join, estimate — is
replayable bit-for-bit by a DuckDB oracle (gated as the 'incremental'
leg of ``dedup_minhash_lsh``).

Scale shape: commit is one signature pass + an append write (no
shuffle of history); screen is one signature pass over the batch + an
equi-join on (band_idx, band_key) against the state. The state side of
that join shuffles per screen unless you land it bucketed by
``band_key`` (saveAsTable + bucketBy — plain parquet paths cannot
declare buckets); for daily batches ≪ history, AQE broadcasts the
BATCH side instead, which is the cheap direction. IDs must be globally
unique across batches — equal-id hits are the same row re-screened,
not duplicates, and are excluded.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from faisssearcher_spark.functions import text as T
from faisssearcher_spark.operators.dedup import lsh_bucket_rows

__all__ = ["EmbeddingStore", "FingerprintStore", "MinHashStore",
           "banded_signatures"]



def _carry_epoch_files(src: str, dst: str) -> None:
    """Hardlink-carry one epoch directory into a fresh state dir (cost
    ∝ file count, not bytes), copy2 fallback for cross-device layouts.
    Regular files only (matching _epoch_manifest's name filtering): a
    stray subdirectory would slip past os.link's caught OSError into
    shutil.copy2 and abort the carry mid-build. Shared by compact()'s
    and expire()'s state rewrites."""
    import shutil

    os.makedirs(dst, exist_ok=True)
    for fn in os.listdir(src):
        if not os.path.isfile(os.path.join(src, fn)):
            continue
        try:
            os.link(os.path.join(src, fn), os.path.join(dst, fn))
        except OSError:
            shutil.copy2(os.path.join(src, fn), os.path.join(dst, fn))


def banded_signatures(df: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text", num_hashes: int = 16,
                      bands: int = 4, shingle_n: int | None = None,
                      seed: int = 42) -> DataFrame:
    """``(id, band_idx, band_key, sig)`` — one row per (document, band).

    The signature computes in the aggregate form (explode → one md5 per
    shingle per 4-slot digest group → ``num_hashes`` min() aggregates
    over cheap substrings; the wide-array form compiles multi-second
    codegen units, NOTES.md) and bands hash to
    8-byte xxhash64 join keys exactly like ``minhash_lsh_join`` — same
    constants, same arithmetic, so store state and self-join candidates
    agree on every bucket."""
    if num_hashes % bands:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})")
    from faisssearcher_spark.functions.sqltext import is_simple_name
    from faisssearcher_spark.operators.dedup import (minhash_band_sql_parts,
                                                     minhash_sig_sql_parts)

    if is_simple_name(id_col) and is_simple_name(text_col):
        units_sql = (T.word_ngrams_sql(text_col, shingle_n) if shingle_n
                     else T.tokens_sql(text_col))
        base = df.selectExpr(f"{id_col} AS id",
                             f"array_distinct({units_sql}) AS __ts")
    else:
        units = (T.word_ngrams(text_col, shingle_n) if shingle_n
                 else T.tokens(text_col))
        base = df.select(F.col(id_col).alias("id"),
                         F.array_distinct(units).alias("__ts"))
    # per-slot sections render as SQL text — the py4j round-trip wall
    # (functions/sqltext.py; parity pinned in test_sqltext_parity.py)
    hash_exprs, agg_exprs, conv_exprs = minhash_sig_sql_parts(
        num_hashes, seed)
    hashed = base.selectExpr("id", "explode_outer(__ts) AS __t") \
        .filter("__t IS NOT NULL") \
        .selectExpr("id", *hash_exprs)
    # string-window mins (lexicographic == numeric on fixed-length
    # lowercase hex), one radix conversion per doc per slot post-agg
    sigs = hashed.groupBy("id").agg(*[F.expr(e) for e in agg_exprs]) \
        .selectExpr("id", *conv_exprs)
    band_vals, sig_arr = minhash_band_sql_parts(num_hashes, bands)
    # band_idx folds INTO the 8-byte key (xxhash64 of idx + value), so
    # candidate joins run on the SINGLE band_key column — the layout
    # that lets a bucketed state table join with ZERO history-side
    # shuffle (Spark only uses bucket output partitioning when the join
    # keys equal the bucket keys; a (band_idx, band_key) composite key
    # gets "Bucketed: false (disabled by query planner)"). Cross-band
    # value collisions now cost one 2^-64 hash collision, the same
    # budget minhash_lsh_join already accepts for its band_key.
    return sigs.selectExpr(
        "id", f"{sig_arr} AS sig",
        f"posexplode(array({', '.join(band_vals)})) AS (band_idx, band_val)") \
        .selectExpr("id", "band_idx",
                    "xxhash64(band_idx, band_val) AS band_key", "sig")


class _IncrementalStore:
    """Shared state plumbing for incremental near-dup stores: parameter
    identity recorded in ``meta`` on first commit and VALIDATED on
    every open (state from different parameters silently never
    collides, which would make every screen vacuously pass), optional
    bucketed-table landing (zero state-side shuffle per screen), and
    the table-property identity guard for pre-existing tables.

    Subclasses define ``_META_PROP`` (the table property name),
    ``_BUCKET_COL`` (the single bucket/band key column), and
    ``_meta_dict()`` (the parameter identity)."""

    _META_PROP: str
    _BUCKET_COL: str

    def __init__(self, spark: SparkSession, path: str, *,
                 bucketed_table: "str | None" = None,
                 n_buckets: int = 64, layout: str = "flat"):
        self.spark = spark
        self.path = path
        # layout="epoch": state lands in epoch=<N> partition subdirs and
        # upserts become BOUNDED merges (append a new epoch + tombstone
        # the batch ids) instead of full-state rewrites — the Delta-ish
        # middle step documented in _merge_state. Part of the store's
        # identity (epoch state read under flat rules, or vice versa,
        # would silently mis-resolve).
        if layout not in ("flat", "epoch"):
            raise ValueError(
                f"layout must be 'flat' or 'epoch', got {layout!r}")
        if layout == "epoch" and bucketed_table:
            raise ValueError(
                "layout='epoch' and bucketed_table are mutually "
                "exclusive (a bucketed table cannot also partition by "
                "epoch; bucketed rewrites already stage+overwrite)")
        self.layout = layout
        if layout == "epoch" and self._local_root() is None:
            raise NotImplementedError(
                "layout='epoch' needs a local/file: path in this build "
                "(epoch listing and the compaction pointer swap are "
                "local-fs operations; remote deployments want "
                "bucketed_table mode or a transactional table format)")
        # bucketed mode: state lands via saveAsTable bucketed on the
        # key column, so every screen's candidate join reads the
        # history BUCKET-ALIGNED — zero shuffle on the state side, only
        # the (small) batch co-partitions into n_buckets. Requires a
        # persistent metastore for the layout to survive sessions
        # (plain parquet paths cannot declare buckets); meta still
        # lives at `path` so parameter identity is validated either way.
        self.bucketed_table = bucketed_table
        self.n_buckets = n_buckets
        mine = self._identity()
        existing = self._read_meta()
        if (existing is not None and bucketed_table
                and "bucketed_table" not in existing
                and {k: v for k, v in mine.items()
                     if k != "bucketed_table"} == existing):
            # legacy meta from before bucketed_table joined the
            # identity: the original parameters match, so accept the
            # open and MIGRATE the meta with the table binding — old
            # stores stay openable (the 'layout' back-compat
            # precedent) and the foreign-table guard closes for them
            # from the first post-upgrade open onward. The binding
            # only becomes authoritative when the TABLE corroborates
            # it (its property carries these parameters): a typo'd —
            # or not-yet-existing — name on the first post-upgrade
            # open must not get stamped into the meta, bricking every
            # later open with the CORRECT name while the wrong one
            # screens a foreign/empty table (review catch).
            tm = self._read_table_meta()
            table_corroborates = (
                tm is not None
                and {k: v for k, v in tm.items()
                     if k != "bucketed_table"} == existing)
            if table_corroborates:
                self._write_meta()
                # migrate the TABLE property too: on a true pre-upgrade
                # store it is also the legacy dict (no bucketed_table
                # key), and leaving it legacy would fail the
                # table_meta != mine check just below — on THIS open
                # and on every later open, since the path meta is
                # already migrated by then (the legacy branch no longer
                # fires) while the property stays legacy. One brick,
                # two symptoms (r11 advice).
                self._stamp_table_meta()
                existing = mine
            else:
                raise ValueError(
                    f"store at {path!r} carries a legacy meta (no "
                    f"table binding) and table {bucketed_table!r} "
                    "does not corroborate this store's parameters — "
                    "pass the table this store was actually committed "
                    "to (its property must match), or rebuild")
        # per-instance memo of "meta is on disk": __init__ just read it,
        # so _append_state never re-reads per commit (each re-read was a
        # full Spark job on the Spark path). Two processes opening the
        # same store both see None and both write — idempotent, the
        # content is the identity-validated parameter dict either way.
        self._meta_present = existing is not None
        if existing is not None and existing != mine:
            raise ValueError(
                f"store at {path!r} was created with {existing}; "
                f"reopening with {mine} would produce state "
                "that never matches — pass the original parameters")
        # the parameter identity must ALSO be validated against the
        # bucketed table itself (r6 ADVICE): a fresh `path` pointed at an
        # EXISTING table created under different parameters would append
        # incompatible state and screens against the old rows would
        # silently never match — so the parameter dict travels as a
        # table property, checked whenever the table pre-exists.
        table_meta = self._read_table_meta()
        if table_meta is not None and table_meta != mine:
            raise ValueError(
                f"bucketed table {bucketed_table!r} was created with "
                f"{table_meta}; opening it with {mine} would append "
                "state that never matches — pass the original "
                "parameters or use a fresh table")
        if (bucketed_table and table_meta is None
                and spark.catalog.tableExists(bucketed_table)):
            if existing is not None:
                # crash recovery, not a foreign table: the PATH meta
                # proves this store identity already committed here —
                # including THIS table name, since _identity() records
                # bucketed_table and existing==mine was enforced above
                # (a foreign/typo'd table can't inherit a re-stamp from
                # some other store's path meta, r10 advice) — and a
                # rewrite's mode('overwrite') drops table properties,
                # so a crash between the overwrite and the re-stamp
                # would otherwise brick the store behind the refusal
                # below (review catch). Re-stamp and continue.
                self._stamp_table_meta()
            else:
                raise ValueError(
                    f"bucketed table {bucketed_table!r} exists but "
                    f"carries no {self._META_PROP} property — it was "
                    f"not created by {type(self).__name__}; refusing "
                    "to append unverifiable state")

    # -- state layout ------------------------------------------------------

    def _identity(self) -> dict:
        """The validated parameter identity: the subclass's hash
        parameters plus the storage layout when it is not the default
        (so metas written by pre-layout stores keep validating), plus
        the bucketed table NAME in bucketed mode — the path meta must
        prove which table this store's state lives in, or the crash-
        recovery re-stamp below could silently claim a pre-existing
        property-less FOREIGN table (r10 advice). A bucketed store's
        path also can't reopen as flat: its path state dir is empty,
        so every screen would vacuously pass."""
        d = dict(self._meta_dict())
        if self.layout != "flat":
            d["layout"] = self.layout
        if self.bucketed_table:
            d["bucketed_table"] = self.bucketed_table
        return d

    def _state_path(self) -> str:
        return os.path.join(self.path, self._active_state_name())

    def _tombstone_path(self) -> str:
        return os.path.join(self.path, "tombstones")

    def _epoch_numbers(self) -> "list[int]":
        """Existing epoch partition numbers in the active state dir
        (epoch layout only; local paths — the layout's contract)."""
        root = self._local_root()
        state = os.path.join(root, self._active_state_name())
        if not os.path.isdir(state):
            return []
        out = []
        for name in os.listdir(state):
            if name.startswith("epoch="):
                try:
                    out.append(int(name.split("=", 1)[1]))
                except ValueError:
                    pass
        return sorted(out)

    def _local_root(self) -> "str | None":
        """Local filesystem root of ``path`` (bare or ``file:`` paths),
        or None for remote schemes (hdfs://, s3a://, ...). A bare path
        is ASSUMED driver-local (true in local/client deployments
        where fs.defaultFS is file://); _rewrite_state re-verifies the
        assumption after its Spark write and fails loudly on a remote
        defaultFS rather than split-braining the pointer. One-char
        'schemes' are Windows drive letters, not schemes."""
        from urllib.parse import urlparse

        parsed = urlparse(self.path)
        if len(parsed.scheme) <= 1:
            return self.path
        if parsed.scheme == "file":
            return parsed.path
        return None

    def _pointer_path(self) -> "str | None":
        root = self._local_root()
        return None if root is None else os.path.join(root, "_current")

    def _active_state_name(self) -> str:
        """Name of the live state directory. Append-only stores never
        move off the default ``state``; :meth:`upsert` / :meth:`compact`
        rewrite into a fresh directory and atomically retarget the
        ``_current`` pointer file (underscore-prefixed: Spark and
        pyarrow dataset discovery both skip it)."""
        p = self._pointer_path()
        if p is not None and os.path.isfile(p):
            with open(p) as fh:
                name = fh.read().strip()
            if name:
                return name
        return "state"

    def _set_active_state_name(self, name: str) -> None:
        p = self._pointer_path()
        tmp = f"{p}.tmp-{os.getpid()}"
        with open(tmp, "w") as fh:
            fh.write(name)
        os.replace(tmp, p)

    def _meta_path(self) -> str:
        return os.path.join(self.path, "meta")

    def _meta_dict(self) -> dict:
        raise NotImplementedError

    def _meta_local_path(self) -> "str | None":
        """The meta dir as a LOCAL filesystem path, or None for remote
        schemes. A ``file:`` URI must be stripped to its path before
        os.path/pyarrow touch it — passing the raw URI through would
        make every existence check False (silently skipping the
        parameter-identity validation) and os.makedirs would create a
        junk relative directory literally named ``file:...``."""
        root = self._local_root()
        return None if root is None else os.path.join(root, "meta")

    def _read_meta(self) -> "dict | None":
        # meta is ONE tiny row — on a local/file: path read it driver-
        # side with pyarrow (a Spark read here is pure job-launch
        # overhead; at local bench scale the meta round-trips were a
        # measurable slice of the whole store arc). pyarrow's dataset
        # discovery skips `_`/`.`-prefixed files, so Spark-written meta
        # dirs (part-* + _SUCCESS) from older stores read fine too.
        # Remote schemes (hdfs://, s3a://) keep the Spark path — there
        # the cluster's filesystem config is the only correct client.
        p = self._meta_local_path()
        if p is not None:
            import pyarrow as pa
            import pyarrow.parquet as pq

            if not os.path.isdir(p) and not os.path.isfile(p):
                return None
            # prefer the FIXED filename _write_meta lands (meta-0.parquet):
            # reading the directory during a concurrent rewrite could see
            # a stale visible leftover PLUS the new file and fail the
            # multi-file read, warn-treating a healthy meta as absent
            # (r10 advice). The directory read remains as the fallback
            # for old Spark-written layouts (part-* + _SUCCESS).
            fixed = os.path.join(p, "meta-0.parquet")
            src = fixed if os.path.isfile(fixed) else p
            try:
                tbl = pq.read_table(src, columns=["meta"])
            except pa.ArrowInvalid as exc:
                # corrupt / partially-written meta only — "absent" is
                # the right read (the next commit rewrites it), but say
                # so: a silent None here would bypass the parameter-
                # identity validation the meta exists for (r9 advice).
                # I/O errors (permissions, transient fs) PROPAGATE —
                # overwriting a store's meta because of an EACCES would
                # be destructive, not idempotent.
                import warnings

                warnings.warn(
                    f"unreadable store meta at {p} ({exc}); treating "
                    f"as absent — the next commit will rewrite it",
                    RuntimeWarning, stacklevel=3)
                return None
            if tbl.num_rows == 0:
                return None
            return json.loads(tbl.column("meta")[0].as_py())
        try:
            row = self.spark.read.parquet(self._meta_path()).first()
        except Exception:
            return None
        return json.loads(row["meta"]) if row else None

    def _write_meta(self) -> None:
        p = self._meta_local_path()
        if p is not None:
            import pyarrow as pa
            import pyarrow.parquet as pq

            # called when no readable meta exists, or to migrate a
            # legacy meta in place (the bucketed_table back-compat
            # path — content moves to the current identity, which the
            # open just validated parameter-for-parameter). Two
            # processes opening a fresh store concurrently is a case
            # _meta_present deems idempotent — so NO rmtree (one writer
            # could delete the dir mid-write of the other, r9 advice):
            # write to a dot-prefixed temp (pyarrow dataset discovery
            # skips `.`/`_` names, so a concurrent reader never sees a
            # half-written file) and os.replace into place atomically.
            # Stale leftovers (old Spark part-*/_SUCCESS layouts or an
            # unreadable meta) are cleared best-effort AFTER the
            # replace so the dir is never left without a meta.
            os.makedirs(p, exist_ok=True)
            final = os.path.join(p, "meta-0.parquet")
            tmp = os.path.join(p, f".meta-{os.getpid()}.tmp")
            pq.write_table(
                pa.table({"meta": [json.dumps(self._identity())]}), tmp)
            os.replace(tmp, final)
            # clear only files dataset discovery would SEE (not `.`/`_`
            # prefixed): a concurrent writer's .meta-<pid>.tmp must
            # survive until ITS os.replace, or we reintroduce the
            # mid-write interference dropping rmtree fixed (review
            # catch); invisible leftovers are harmless either way
            for name in os.listdir(p):
                if name != "meta-0.parquet" and not name.startswith(
                        (".", "_")):
                    try:
                        os.remove(os.path.join(p, name))
                    except OSError:
                        pass
            return
        self.spark.createDataFrame(
            [(json.dumps(self._identity()),)], "meta string") \
            .coalesce(1).write.mode("overwrite").parquet(self._meta_path())

    def _read_table_meta(self) -> "dict | None":
        if not self.bucketed_table or \
                not self.spark.catalog.tableExists(self.bucketed_table):
            return None
        props = {r["key"]: r["value"] for r in self.spark.sql(
            f"SHOW TBLPROPERTIES {self.bucketed_table}").collect()}
        raw = props.get(self._META_PROP)
        return json.loads(raw) if raw else None

    def _stamp_table_meta(self) -> None:
        payload = json.dumps(self._identity()).replace("'", "''")
        self.spark.sql(
            f"ALTER TABLE {self.bucketed_table} SET TBLPROPERTIES "
            f"('{self._META_PROP}' = '{payload}')")

    def _ensure_meta(self) -> None:
        if not self._meta_present:
            self._write_meta()
            self._meta_present = True

    def _write_epoch(self, rows: DataFrame) -> int:
        """Write ``rows`` as the next epoch partition and return its
        number — THE one epoch-assignment site (commit and upsert both
        route here, so a numbering fix can never diverge them).

        Epoch numbering is listdir-max+1 and therefore SINGLE-WRITER:
        tombstone ordering needs a total order of epochs, which
        concurrent uncoordinated writers cannot produce (two could
        claim the same number — the problem Delta's commit protocol
        exists to solve). Concurrent ingest wants layout='flat'
        (mode('append') tolerates it) or a transactional table format.

        After the Spark write, the partition's LOCAL visibility is
        re-verified exactly like _rewrite_state's pointer check: a
        scheme-less path on a remote-defaultFS cluster would land the
        epoch where the driver-side listing can never see it, making
        every later commit recompute the same number and die on
        'path already exists' — fail loudly instead (review catch)."""
        epochs = self._epoch_numbers()
        nxt = (epochs[-1] + 1) if epochs else 0
        target = os.path.join(self._state_path(), f"epoch={nxt}")
        rows.write.parquet(target)
        local = os.path.join(self._local_root(),
                             self._active_state_name(), f"epoch={nxt}")
        if not os.path.isdir(local):
            self._hadoop_delete(target)
            raise NotImplementedError(
                f"store path {self.path!r} resolves to a non-local "
                "filesystem (fs.defaultFS is remote): epoch layout "
                "needs a driver-visible local path — pass an explicit "
                "file:// URI, or use layout='flat'/bucketed_table for "
                "cluster deployments")
        return nxt

    def _append_state(self, rows: DataFrame) -> None:
        """Append a batch's state rows (meta written on first commit).
        Re-running a commit appends duplicate rows — screens stay
        CORRECT (the candidate join de-duplicates pairs) but the state
        grows; gate commits behind your pipeline's exactly-once
        bookkeeping (the streaming/sinks.py discipline) when replays
        are possible. Epoch-layout stores are SINGLE-WRITER (see
        _write_epoch); flat mode('append') tolerates concurrent
        committers."""
        self._ensure_meta()
        if self.bucketed_table:
            stamped = self._read_table_meta() is not None
            (rows.write.bucketBy(self.n_buckets, self._BUCKET_COL)
             .sortBy(self._BUCKET_COL).mode("append")
             .format("parquet").saveAsTable(self.bucketed_table))
            if not stamped:
                self._stamp_table_meta()
        elif self.layout == "epoch":
            self._write_epoch(rows)
        else:
            rows.write.mode("append").parquet(self._state_path())

    def _merge_state(self, rows: DataFrame, ids: DataFrame) -> None:
        """Keyed MERGE (delete-matched + insert) of a batch's state
        rows: every existing state row whose ``id`` appears in the
        batch is deleted, then the batch's rows land — the maintenance
        story append-only commits lack (re-committing a corrected
        batch would otherwise leave STALE rows that screens keep
        matching until a full rebuild). On an empty store this is
        exactly a commit.

        Cost contract: a merge REWRITES the whole state (read → anti-
        join on the batch's ids → write to a fresh epoch → atomic
        pointer swap). That is the honest price of MERGE on plain
        parquet — this is the occasional-correction path, not the
        ingest path; a deployment merging constantly wants a
        transactional table format (Delta/Iceberg) whose MERGE
        rewrites only matched files.

        ``ids`` is the batch's id frame (one ``id`` column). It must
        come from the BATCH, not from the derived state rows: a row
        corrected to produce no state (empty text, NULL fingerprint)
        still has to clear its stale rows.

        ``layout="epoch"`` stores merge BOUNDED instead: the batch's
        rows land as a NEW epoch partition and the batch's ids append
        to a tombstone table ``(id, upto_epoch)`` that the state read
        resolves (keep a row iff its epoch exceeds the id's highest
        tombstone) — cost ∝ batch, not state, the Delta-ish middle
        step between full rewrites and a transactional table format.
        The epoch writes BEFORE the tombstone, so a crash between the
        two leaves BOTH vintages visible (duplicate screen hits, never
        loss). The REPAIR is re-running the upsert for that batch (its
        tombstone then outranks both) — NOT compact(): compaction
        folds whatever the resolved state shows, so it would bake the
        duplicate vintage in permanently (review catch).
        ``compact()`` after a clean merge folds the tombstone-touched
        epochs (bounded, id-range-pruned; ``full=True`` for the whole
        state) and clears the tombstones."""
        if self.layout == "epoch":
            self._ensure_meta()
            if not self._epoch_numbers():
                self._append_state(rows)
                return
            nxt = self._write_epoch(rows)
            (ids.select("id").distinct()
             .withColumn("upto_epoch", F.lit(nxt - 1))
             .write.mode("append").parquet(self._tombstone_path()))
            return
        cur = self.state()
        if cur is None:
            self._append_state(rows)
            return
        keep = cur.join(ids.select("id").distinct(), "id", "left_anti")
        self._rewrite_state(keep.unionByName(rows.select(*cur.columns)))

    def compact(self, full: bool = False) -> None:
        """Fold tombstoned state back into clean epochs.

        ``full=True`` (and every flat/bucketed-layout compact, where
        bounded has no meaning) rewrites the WHOLE state as one
        de-duplicated epoch: collapses rows duplicated by replayed
        commits and merges the per-commit small files of a long append
        history — cost ∝ state.

        Epoch-layout default is the BOUNDED compact (r10 verdict #4):
        a manifest of per-epoch id ranges — derived on demand from the
        epochs' parquet FOOTER statistics, so it is self-consistent
        with the files by construction (no separate manifest file, no
        write-ordering crash window) — prunes compaction to the
        epochs a tombstone could actually touch (an epoch e is
        affected iff some tombstone has ``upto_epoch >= e`` AND its id
        inside e's [min_id, max_id]; epochs without usable footer
        stats are conservatively affected). Affected epochs fold,
        tombstone-resolved and de-duplicated, into one fresh epoch
        numbered above every live tombstone; UNAFFECTED epochs carry
        over by hardlink (cost ∝ their file count, not bytes); the
        pointer swap stays atomic for readers and all tombstones clear
        (every row they could kill lived in an affected epoch). Cost ∝
        touched epochs + tombstones — the Delta-style bounded MERGE's
        maintenance half. Duplicate rows from replayed commits collapse
        only when their epochs fold; run ``full=True`` occasionally for
        whole-state dedup + small-file compaction. No-op before the
        first commit. A TOMBSTONE-FREE epoch store takes the full path
        too: there is nothing bounded to fold, and the pre-bounded
        contract (collapse replayed commits, merge small files) must
        keep holding for append-only callers."""
        import shutil
        import uuid
        from functools import reduce

        root = None if self.layout != "epoch" else self._local_root()
        tomb_dir = None if root is None else \
            os.path.join(root, "tombstones")
        if full or tomb_dir is None or not os.path.isdir(tomb_dir):
            cur = self.state()
            if cur is None:
                return
            self._rewrite_state(cur.distinct())
            return
        epochs = self._epoch_numbers()
        if not epochs:
            shutil.rmtree(tomb_dir, ignore_errors=True)
            return
        manifest = self._epoch_manifest(epochs)
        tomb = self.spark.read.parquet(self._tombstone_path())
        aggs = []
        for e in epochs:
            cond = F.col("upto_epoch") >= F.lit(e)
            bounds = manifest.get(e)
            if bounds is not None:
                cond = cond & F.col("id").between(F.lit(bounds[0]),
                                                  F.lit(bounds[1]))
            aggs.append(F.max(F.when(cond, F.lit(1)).otherwise(F.lit(0)))
                        .alias(f"e{e}"))
        flags = tomb.agg(*aggs).first()
        affected = [e for e in epochs if flags[f"e{e}"] == 1]
        if not affected:
            # every tombstone misses every epoch's id range: they kill
            # nothing, and any concurrent reader resolving against a
            # partially-removed tombstone set deletes a subset of
            # nothing — safe to clear without a state rewrite
            shutil.rmtree(tomb_dir, ignore_errors=True)
            return
        old_name = self._active_state_name()
        parts = [self.spark.read.parquet(
                    os.path.join(self._state_path(), f"epoch={e}"))
                 .withColumn("epoch", F.lit(e)) for e in affected]
        surv = self._apply_tombstones(
            reduce(DataFrame.unionByName, parts), tomb).distinct()
        nxt = epochs[-1] + 1
        new_name = f"state-{uuid.uuid4().hex[:12]}"
        surv.write.parquet(
            os.path.join(self.path, new_name, f"epoch={nxt}"))
        local_new = os.path.join(root, new_name)
        if not os.path.isdir(os.path.join(local_new, f"epoch={nxt}")):
            self._hadoop_delete(os.path.join(self.path, new_name))
            raise NotImplementedError(
                f"store path {self.path!r} resolves to a non-local "
                "filesystem (fs.defaultFS is remote): the plain-parquet "
                "pointer swap needs a driver-visible local path — pass "
                "an explicit file:// URI, or use bucketed_table mode / "
                "a transactional table format for cluster deployments")
        for e in epochs:
            if e in affected:
                continue
            src = os.path.join(root, old_name, f"epoch={e}")
            dst = os.path.join(local_new, f"epoch={e}")
            _carry_epoch_files(src, dst)
        self._ensure_meta()
        self._set_active_state_name(new_name)
        if old_name != new_name:
            shutil.rmtree(os.path.join(root, old_name),
                          ignore_errors=True)
        shutil.rmtree(tomb_dir, ignore_errors=True)

    def expire(self, *, upto_epoch: "int | None" = None,
               keep_last: "int | None" = None) -> "list[int]":
        """Drop WHOLE epochs from an epoch-layout store — the retention
        step that turns unbounded dedup history into a SLIDING WINDOW
        (screen new batches against the last N ingest windows only; at
        100 TB the #1 operational problem of an append-forever state
        is that it never shrinks). Pass exactly one of:

        - ``upto_epoch`` — drop every epoch ``<= upto_epoch``;
        - ``keep_last``  — keep only the newest N epochs.

        Zero Spark jobs: kept epochs carry into a fresh state dir by
        HARDLINK (cost ∝ their file count, not bytes), the pointer
        swap is atomic for readers, dropped epochs delete after the
        swap — the compact() machinery's retention half. Tombstones
        stay untouched: kept epochs keep their numbers, so every
        surviving (id, upto_epoch) still resolves identically; entries
        whose targets were dropped are dead weight that the next
        ``compact()`` clears. Refuses to drop EVERY epoch (a store
        with no state screens vacuously — rebuild instead). Returns
        the dropped epoch numbers ([] when nothing qualified).
        Single-writer, like upsert/compact — and like
        ``_rewrite_state``, there is NO retention window for in-flight
        READERS either: the old state directory deletes right after
        the pointer swap, so a screen already executing against it can
        fail mid-job. Schedule expiry when no screen is in flight."""
        import shutil
        import uuid

        if (upto_epoch is None) == (keep_last is None):
            raise ValueError("pass exactly one of upto_epoch or "
                             "keep_last")
        if self.layout != "epoch":
            raise NotImplementedError(
                "expire() needs layout='epoch' — flat/bucketed stores "
                "have no epoch structure to retire; rebuild the store "
                "from the retained corpus instead")
        if keep_last is not None and keep_last < 1:
            raise ValueError(f"keep_last must be >= 1, got {keep_last}")
        epochs = self._epoch_numbers()
        if keep_last is not None:
            dropped = epochs[:-keep_last]
        else:
            dropped = [e for e in epochs if e <= upto_epoch]
        if not dropped:
            return []
        if len(dropped) == len(epochs):
            raise ValueError(
                f"expire() would drop every epoch ({epochs}); a store "
                "with no state screens vacuously — keep at least one "
                "epoch, or rebuild a fresh store")
        root = self._local_root()
        old_name = self._active_state_name()
        new_name = f"state-{uuid.uuid4().hex[:12]}"
        local_new = os.path.join(root, new_name)
        gone = set(dropped)
        for e in epochs:
            if e in gone:
                continue
            src = os.path.join(root, old_name, f"epoch={e}")
            dst = os.path.join(local_new, f"epoch={e}")
            _carry_epoch_files(src, dst)
        self._ensure_meta()
        self._set_active_state_name(new_name)
        if old_name != new_name:
            shutil.rmtree(os.path.join(root, old_name),
                          ignore_errors=True)
        return dropped

    def _epoch_manifest(self, epochs: "list[int] | None" = None
                        ) -> "dict[int, tuple | None]":
        """Per-epoch ``(min_id, max_id)`` bounds derived from the
        epoch files' parquet footer statistics — pure driver-side
        metadata reads, no Spark job, and self-consistent with the
        state by construction (the files ARE the manifest). ``None``
        marks an epoch with unusable stats (missing id column stats,
        zero-row files): the bounded compact treats it as matching
        every tombstone. Parquet string stats may be TRUNCATED bounds;
        the spec keeps them valid outer bounds, which is all range
        pruning needs (a false positive costs a fold, never a miss)."""
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as papq

        root = self._local_root()
        state = os.path.join(root, self._active_state_name())

        def _file_bounds(path: str) -> "tuple | None":
            """(min, max) of the id column from one file's footer, or
            None when unusable."""
            try:
                md = papq.ParquetFile(path).metadata
            except Exception:
                return None
            idx = next((i for i in range(md.num_columns)
                        if md.schema.column(i).name == "id"), None)
            if idx is None:
                return None
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    return None
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            return None if lo is None else (lo, hi)

        if epochs is None:
            epochs = self._epoch_numbers()
        files: "list[tuple[int, str]]" = []
        for e in epochs:
            d = os.path.join(state, f"epoch={e}")
            files.extend(
                (e, os.path.join(d, n)) for n in os.listdir(d)
                if not n.startswith((".", "_"))
                and n.endswith(".parquet"))
        # footer reads are I/O-bound metadata fetches and pyarrow
        # releases the GIL — a long append history is hundreds of
        # epochs x dozens of part files, where the sequential form
        # dominated the whole bounded compact (measured ~1 ms/file)
        with ThreadPoolExecutor(max_workers=16) as pool:
            bounds = list(pool.map(lambda ef: _file_bounds(ef[1]), files))
        out: "dict[int, tuple | None]" = {e: None for e in epochs}
        acc: "dict[int, list]" = {}
        for (e, _), b in zip(files, bounds):
            acc.setdefault(e, []).append(b)
        for e in epochs:
            got = acc.get(e, [])
            # zero-row files carry no stats and bound nothing; a file
            # that EXISTS but is unusable poisons the epoch (must stay
            # conservative). Distinguish: unusable == None from
            # _file_bounds on a non-empty file... a zero-row file also
            # returns None, so an all-None epoch stays conservative
            # (correct either way: None => always affected).
            ok = [b for b in got if b is not None]
            if len(ok) == len(got) and ok:
                out[e] = (min(b[0] for b in ok), max(b[1] for b in ok))
        return out

    def _rewrite_state(self, merged: DataFrame) -> None:
        """Replace the state with ``merged``, atomically for readers.

        Rewrites carry the same ensure-meta duty as appends: a store
        whose meta was unreadable (warned as absent) and then only
        ever merged/compacted would otherwise never restore the
        parameter-identity validation (review catch).

        Bucketed-table mode: stage to a temp parquet path first (Spark
        refuses to overwrite a table it is reading), then overwrite
        the table under the same bucketing and re-stamp the identity
        property (overwrite drops table properties). Plain-parquet
        mode: write a FRESH ``state-<id>`` directory and retarget the
        ``_current`` pointer via tmp-file + os.replace — readers see
        the old state until the pointer flips, never a half-written
        directory; requires a local/``file:`` path (a remote object
        store has no atomic rename — that deployment wants the
        bucketed-table mode or a transactional table format). The old
        epoch directory is deleted right after the swap: a query
        ALREADY EXECUTING against it can fail mid-job (there is no
        retention window on plain parquet — schedule merges when no
        screen is in flight; Delta/Iceberg's vacuum-with-retention is
        the upgrade path)."""
        self._ensure_meta()
        if self.bucketed_table:
            import uuid

            # stage UNDER the store's own path so the staged copy
            # lives on whatever filesystem Spark resolves self.path to
            # (a driver-local tempfile here would leak a state-sized
            # dir on a cluster whose defaultFS is remote, and on a
            # multi-node file:// cluster each executor would write its
            # own machine's /tmp — review catch); dot-prefixed so
            # state()/meta dataset discovery never sees it, cleaned up
            # through the Hadoop FileSystem API (scheme-aware)
            staged_path = os.path.join(
                self.path, f".staging-{uuid.uuid4().hex[:12]}")
            try:
                merged.write.parquet(staged_path)
                staged = self.spark.read.parquet(staged_path)
                (staged.write.bucketBy(self.n_buckets, self._BUCKET_COL)
                 .sortBy(self._BUCKET_COL).mode("overwrite")
                 .format("parquet").saveAsTable(self.bucketed_table))
            finally:
                self._hadoop_delete(staged_path)
            self._stamp_table_meta()
            return
        root = self._local_root()
        if root is None:
            raise NotImplementedError(
                "upsert/compact on a plain-parquet store require a "
                "local path in this build: a remote object-store "
                "rewrite needs an atomic swap (use bucketed_table mode "
                "on a metastore, or a transactional table format like "
                "Delta/Iceberg)")
        import shutil
        import uuid

        new_name = f"state-{uuid.uuid4().hex[:12]}"
        target = os.path.join(self.path, new_name)
        if self.layout == "epoch":
            # the compacted partition's number must EXCEED every live
            # tombstone's upto_epoch (≤ the old max epoch), or stale
            # tombstones would kill the compacted rows in the window
            # before they are cleared below
            epochs = self._epoch_numbers()
            target = os.path.join(
                target, f"epoch={(epochs[-1] + 1) if epochs else 0}")
        merged.write.parquet(target)
        if not os.path.isdir(os.path.join(root, new_name)):
            # Spark resolved the scheme-less path against a NON-local
            # fs.defaultFS: the driver-local pointer file would be
            # invisible to other sessions while the epochs live
            # remotely — a silent split-brain (review catch). Undo the
            # epoch write and refuse loudly.
            self._hadoop_delete(os.path.join(self.path, new_name))
            raise NotImplementedError(
                f"store path {self.path!r} resolves to a non-local "
                "filesystem (fs.defaultFS is remote): the plain-parquet "
                "pointer swap needs a driver-visible local path — pass "
                "an explicit file:// URI, or use bucketed_table mode / "
                "a transactional table format for cluster deployments")
        old = self._active_state_name()
        self._set_active_state_name(new_name)
        if old != new_name:
            shutil.rmtree(os.path.join(root, old), ignore_errors=True)
        if self.layout == "epoch":
            # folded state carries no deletions; stale tombstones can't
            # affect it (its epoch outranks them) and are cleared here.
            # A failed clear stays CORRECT, just unpruned.
            shutil.rmtree(os.path.join(root, "tombstones"),
                          ignore_errors=True)

    def _hadoop_delete(self, path_str: str) -> None:
        """Scheme-aware recursive delete through the Hadoop FileSystem
        API — resolves ``path_str`` exactly as Spark's writers do, so
        cleanup hits the same filesystem the data landed on."""
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path_str)
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()
        hpath.getFileSystem(conf).delete(hpath, True)

    def state(self) -> "DataFrame | None":
        """The accumulated state table, or None before the first
        commit (screening an empty store legitimately finds nothing)."""
        from pyspark.errors import AnalysisException

        try:
            if self.bucketed_table:
                if not self.spark.catalog.tableExists(self.bucketed_table):
                    return None
                return self.spark.table(self.bucketed_table)
            df = self.spark.read.parquet(self._state_path())
            if self.layout == "epoch":
                df = self._resolve_epochs(df)
            return df
        except AnalysisException:
            return None

    def _resolve_epochs(self, df: DataFrame) -> DataFrame:
        """Tombstone resolution for epoch-layout state: a row survives
        iff its epoch exceeds its id's highest tombstone. The tombstone
        table is correction-sized (ids of upserted batches), so AQE
        broadcasts it when it fits; the partition-discovered ``epoch``
        column never leaves this method — screens see the same schema
        as flat stores."""
        # existence is one LOCAL stat (the layout's contract is a
        # local path) — append-only epoch stores that never upserted
        # skip the tombstone read entirely, the per-call overhead
        # class this file already avoids for meta (review catch)
        if not os.path.isdir(os.path.join(self._local_root(),
                                          "tombstones")):
            return df.drop("epoch")
        tomb = self.spark.read.parquet(self._tombstone_path())
        return self._apply_tombstones(df, tomb)

    @staticmethod
    def _apply_tombstones(df: DataFrame, tomb: DataFrame) -> DataFrame:
        """keep-iff-epoch-outranks-tombstone — THE one definition of
        epoch resolution, shared by reads (:meth:`_resolve_epochs`)
        and the bounded :meth:`compact` fold so the compacted state
        can never diverge from what screens resolved (review catch).
        Consumes and drops the ``epoch`` column."""
        t = tomb.groupBy("id").agg(F.max("upto_epoch").alias("__upto"))
        return (df.join(t, "id", "left")
                .filter(F.col("epoch")
                        > F.coalesce(F.col("__upto"), F.lit(-1)))
                .drop("__upto", "epoch"))


class MinHashStore(_IncrementalStore):
    """Persisted banded-MinHash state: ``commit`` batches in, ``screen``
    new batches against everything committed so far.

    The hash parameters are part of the state's identity — they are
    recorded in ``meta`` on first commit and VALIDATED on every open
    (signatures from different parameters silently never collide, which
    would make every screen vacuously pass)."""

    #: table property carrying the hash-parameter identity in bucketed
    #: mode (the table, not just `path`, is the state)
    _META_PROP = "faisssearcher.minhash.meta"
    _BUCKET_COL = "band_key"

    def __init__(self, spark: SparkSession, path: str, *,
                 num_hashes: int = 16, bands: int = 4,
                 shingle_n: int | None = 3, seed: int = 42,
                 bucketed_table: "str | None" = None,
                 n_buckets: int = 64, layout: str = "flat"):
        if num_hashes % bands:
            raise ValueError(
                f"bands ({bands}) must divide num_hashes ({num_hashes})")
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_n = shingle_n
        self.seed = seed
        super().__init__(spark, path, bucketed_table=bucketed_table,
                         n_buckets=n_buckets, layout=layout)

    def _meta_dict(self) -> dict:
        return {"num_hashes": self.num_hashes, "bands": self.bands,
                "shingle_n": self.shingle_n, "seed": self.seed}

    def _signatures(self, docs: DataFrame, id_col: str,
                    text_col: str) -> DataFrame:
        return banded_signatures(
            docs, id_col=id_col, text_col=text_col,
            num_hashes=self.num_hashes, bands=self.bands,
            shingle_n=self.shingle_n, seed=self.seed)

    # -- API ---------------------------------------------------------------

    def commit(self, docs: DataFrame, *, id_col: str = "doc_id",
               text_col: str = "text") -> None:
        """Append the batch's banded signatures to the state (see
        ``_IncrementalStore._append_state`` for replay semantics)."""
        self._append_state(self._signatures(docs, id_col, text_col))

    def upsert(self, docs: DataFrame, *, id_col: str = "doc_id",
               text_col: str = "text") -> None:
        """MERGE the batch by document id: committed signature rows
        for these ids are deleted and replaced by the batch's — the
        corrected-batch maintenance path (see
        ``_IncrementalStore._merge_state`` for the rewrite contract)."""
        self._merge_state(self._signatures(docs, id_col, text_col),
                          docs.select(F.col(id_col).alias("id")))

    def screen(self, docs: DataFrame, *, id_col: str = "doc_id",
               text_col: str = "text",
               threshold: float = 0.7) -> DataFrame:
        """``(new_id, known_id, est_jaccard)`` for every batch document
        whose signature-estimated Jaccard against a committed document
        reaches ``threshold`` (candidates from the banded equi-join —
        the n×|history| space is never formed)."""
        if not 0.0 < threshold <= 1.0:
            raise ValueError(f"threshold must be in (0, 1], got {threshold}")
        new = self._signatures(docs, id_col, text_col)
        known = self.state()
        if known is None:
            return (new.select(F.col("id").alias("new_id"),
                               F.col("id").alias("known_id"),
                               F.lit(0.0).alias("est_jaccard"))
                    .limit(0))
        cand = (new.alias("n")
                .join(known.alias("k"),
                      (F.col("n.band_key") == F.col("k.band_key"))
                      & (F.col("n.id") != F.col("k.id")))
                .select(F.col("n.id").alias("new_id"),
                        F.col("k.id").alias("known_id"),
                        F.col("n.sig").alias("__sa"),
                        F.col("k.sig").alias("__sb"))
                .dropDuplicates(["new_id", "known_id"]))
        est = (F.size(F.filter(
            F.zip_with("__sa", "__sb", lambda x, y: x == y),
            lambda m: m)) / F.lit(float(self.num_hashes)))
        return (cand.withColumn("est_jaccard", est)
                .filter(F.col("est_jaccard") >= threshold)
                .select("new_id", "known_id", "est_jaccard"))

    def filter_new(self, docs: DataFrame, *, id_col: str = "doc_id",
                   text_col: str = "text",
                   threshold: float = 0.7) -> DataFrame:
        """The batch minus every document screened as a near-duplicate
        of committed history — one anti-join on the screen hits. Pair
        with ``minhash_lsh_join`` for IN-batch near-dups; this store
        only answers "seen before?"."""
        hits = self.screen(docs, id_col=id_col, text_col=text_col,
                           threshold=threshold) \
            .select(F.col("new_id").alias(id_col)).distinct()
        return docs.join(hits, id_col, "left_anti")


class EmbeddingStore(_IncrementalStore):
    """Persisted sign-LSH + fp16 state for incremental EMBEDDING
    near-dup screening — the cosine analog of :class:`MinHashStore`.

    Why codes, not vectors: exact verification needs the stored side's
    vector, but float32 history is the corpus-sized thing the store
    exists to avoid re-reading at full width. State keeps the fp16
    codec (``functions/vector.quantize_f16`` — 2 B/component, uniform
    RELATIVE precision), so a screened candidate scores as
    cos(new_vector, decode(stored_code)): exact on the batch side,
    within fp16 rounding (~5e-4 relative per component) on the history
    side — thresholds are near-dup semantics, not exact-match, and the
    decode is bit-deterministic (numpy-parity pinned), so screens are
    replayable cross-engine.

    Scale shape mirrors MinHashStore: commit is one bucket+encode pass
    and an append (state rows = tables × (8 B key + 2·dim B code) per
    vector); screen is one bucket pass over the batch + an equi-join on
    the folded ``bucket_key`` against the state — land the state
    bucketed (``bucketed_table=``) for zero history-side shuffle. The
    LSH parameters AND dimension are the state's identity, validated on
    every open. IDs must be globally unique across batches."""

    _META_PROP = "faisssearcher.embedlsh.meta"
    _BUCKET_COL = "bucket_key"

    def __init__(self, spark: SparkSession, path: str, *, dim: int,
                 tables: int = 8, bits: int = 8, seed: int = 42,
                 planes_mode: str = "random",
                 bucketed_table: "str | None" = None,
                 n_buckets: int = 64, layout: str = "flat"):
        if dim < 1:
            raise ValueError(f"dim must be >= 1 (got {dim})")
        self.dim = int(dim)
        self.tables = tables
        self.bits = bits
        self.seed = seed
        self.planes_mode = planes_mode
        super().__init__(spark, path, bucketed_table=bucketed_table,
                         n_buckets=n_buckets, layout=layout)

    def _meta_dict(self) -> dict:
        return {"dim": self.dim, "tables": self.tables,
                "bits": self.bits, "seed": self.seed,
                "planes_mode": self.planes_mode, "codec": "f16"}

    def _bucket_code_rows(self, vecs: DataFrame, id_col: str,
                          vec_col: str) -> DataFrame:
        """``(id, bucket_key, code)`` — one row per (vector, table);
        bucket_key folds (table, bucket) into one 8-byte xxhash64 key
        (the bucket-keys-equal-join-keys rule that lets a bucketed
        state table join with zero history-side shuffle). The f16 code
        rides the bucket projection as a payload column — the state
        layout repeats it per table either way, so carrying it beats
        the batch-sized shuffle join back on id this used to do. The
        store's dim is part of its VALIDATED meta identity, so the
        bucket pass skips the eager dim probe; a batch whose vectors
        don't match fails the in-plan length assertion loudly."""
        from faisssearcher_spark.functions.vector import quantize_f16

        src = vecs.select(F.col(id_col).alias("id"),
                          F.col(vec_col).alias("__v"),
                          quantize_f16(vec_col).alias("code"))
        buckets = lsh_bucket_rows(
            src, id_col="id", vec_col="__v", tables=self.tables,
            bits=self.bits, seed=self.seed, dim=self.dim,
            planes_mode=self.planes_mode, probe_dim=False,
            payload=["code"])
        return buckets.select(
            "id", F.xxhash64("t", "bucket").alias("bucket_key"), "code")

    # -- API ---------------------------------------------------------------

    def commit(self, vecs: DataFrame, *, id_col: str = "vec_id",
               vec_col: str = "embedding") -> None:
        """Append the batch's (bucket_key, fp16 code) rows to the state
        (see ``_IncrementalStore._append_state`` for replay semantics)."""
        self._append_state(self._bucket_code_rows(vecs, id_col, vec_col))

    def upsert(self, vecs: DataFrame, *, id_col: str = "vec_id",
               vec_col: str = "embedding") -> None:
        """MERGE the batch by vector id: committed bucket/code rows for
        these ids are deleted and replaced by the batch's (see
        ``_IncrementalStore._merge_state`` for the rewrite contract)."""
        self._merge_state(self._bucket_code_rows(vecs, id_col, vec_col),
                          vecs.select(F.col(id_col).alias("id")))

    def screen(self, vecs: DataFrame, *, id_col: str = "vec_id",
               vec_col: str = "embedding",
               threshold: float = 0.9,
               score_scale: "int | None" = None) -> DataFrame:
        """``(new_id, known_id, cos_sim)`` for every batch vector whose
        cosine against a committed vector's DECODED code reaches
        ``threshold`` (candidates from the bucket equi-join — the
        n×|history| space is never formed)."""
        from faisssearcher_spark.functions import metrics as M
        from faisssearcher_spark.functions.vector import dequantize_f16

        if not -1.0 <= threshold <= 1.0:
            raise ValueError(
                f"threshold must be in [-1, 1], got {threshold}")
        # dim is store-identity-validated; skip the eager probe (the
        # in-plan assertion still fails a mismatched batch loudly)
        new_b = lsh_bucket_rows(
            vecs, id_col=id_col, vec_col=vec_col, tables=self.tables,
            bits=self.bits, seed=self.seed, dim=self.dim,
            planes_mode=self.planes_mode, probe_dim=False) \
            .select("id", F.xxhash64("t", "bucket").alias("bucket_key"))
        new_v = vecs.select(F.col(id_col).alias("new_id"),
                            F.col(vec_col).alias("__nv"))
        known = self.state()
        if known is None:
            return (new_v.select("new_id",
                                 F.col("new_id").alias("known_id"),
                                 F.lit(0.0).alias("cos_sim"))
                    .limit(0))
        cand = (new_b.alias("n")
                .join(known.alias("k"),
                      (F.col("n.bucket_key") == F.col("k.bucket_key"))
                      & (F.col("n.id") != F.col("k.id")))
                .select(F.col("n.id").alias("new_id"),
                        F.col("k.id").alias("known_id"))
                .dropDuplicates(["new_id", "known_id"]))
        # decode each DISTINCT stored code ONCE and join it back to the
        # candidates (guide §1.2 — don't recompute per pair what is a
        # per-vector property): at high-collision bucket shapes the
        # candidate set approaches all-pairs (measured 643k candidates
        # from a 1k×1k gate split), and the 64-element CASE-chain
        # decode used to run once per CANDIDATE instead of once per
        # stored vector (~650× the work; screen exec measured 5.1 s →
        # the decode now runs |history| times). The code column also
        # leaves the bucket join, so candidate shuffles move two longs,
        # not the f16 payload. State rows repeat (id, code) per table;
        # ids re-committed with DIFFERENT vectors keep today's contract
        # (one arbitrary vintage per pair — dropDuplicates picked one
        # arbitrary row's code before this change too); use upsert for
        # replace semantics. The one-element explode barrier stages the
        # decode so cosine's dot and norm branches share it (Catalyst
        # does not CSE across those aggregate branches).
        # decode only ids that actually appear as candidates (review
        # catch: decoding ALL history would invert the optimization in
        # the small-batch-vs-large-history regime — a 100-vector batch
        # against 1M committed vectors has ~thousands of candidates);
        # the semi-join runs BEFORE the per-id dedup so the dedup
        # shuffle also carries candidates only
        kids = cand.select(F.col("known_id").alias("id")).distinct()
        kdec = (known.select("id", "code")
                .join(kids, "id", "left_semi")
                .dropDuplicates(["id"])
                .select(F.col("id").alias("known_id"),
                        F.explode(F.array(dequantize_f16("code")))
                        .alias("__kv"))
                .withColumn("__kn", M.l2_norm("__kv")))
        # norms are per-VECTOR properties too: precompute them on each
        # side (1 per vector) so the per-candidate work is ONE dot
        # instead of dot + two 64-element norm aggregates. Same doubles
        # as M.cosine by construction: identical l2_norm expressions on
        # identical inputs, then the same product/divide/zero-guard —
        # cosine = when(|a||b| != 0, dot/(|a||b|)).
        nv = new_v.withColumn("__nn", M.l2_norm("__nv"))
        staged = (cand.join(nv, "new_id")
                  .join(kdec, "known_id")
                  .select("new_id", "known_id", "__nv", "__kv",
                          "__nn", "__kn"))
        denom = F.col("__nn") * F.col("__kn")
        score = F.when(denom != 0.0,
                       M.inner_product(F.col("__nv"), F.col("__kv"))
                       / denom)
        if score_scale is not None:
            score = F.round(score, score_scale)
        return (staged
                .withColumn("cos_sim", score)
                .filter(F.col("cos_sim") >= threshold)
                .select("new_id", "known_id", "cos_sim"))

    def filter_new(self, vecs: DataFrame, *, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   threshold: float = 0.9) -> DataFrame:
        """The batch minus every vector screened as a near-duplicate of
        committed history. Pair with ``embedding_cosine_pairs`` for
        IN-batch near-dups; this store only answers "seen before?"."""
        hits = self.screen(vecs, id_col=id_col, vec_col=vec_col,
                           threshold=threshold) \
            .select(F.col("new_id").alias(id_col)).distinct()
        return vecs.join(hits, id_col, "left_anti")


class FingerprintStore(_IncrementalStore):
    """Persisted banded HAMMING-fingerprint state — the third
    incremental near-dup store, completing the modality matrix:
    :class:`MinHashStore` screens text shingles, :class:`EmbeddingStore`
    screens dense vectors, this screens the engine's 64-bit-or-less
    integer fingerprints (SimHash documents, dHash images, energy-delta
    audio prints, per-frame video hashes — everything
    ``dedup.hamming_pairs`` pairs in batch).

    State rows are ``(id, band_key, fp)`` with the maximal-width
    pigeonhole band plan (``dedup.hamming_band_widths`` — any pair at
    hamming ≤ max_hamming shares at least one full band) folded into
    ONE 8-byte xxhash64 ``band_key``, the bucket-keys-equal-join-keys
    layout that lets a bucketed state table screen with zero
    history-side shuffle. ``bits`` and ``max_hamming`` are the state's
    identity (they fix the band plan — state banded for one plan never
    collides under another), validated on every open. Screening at a
    STRICTER radius than the store was built for is sound (the band
    guarantee covers every h ≤ max_hamming); a looser radius is
    refused — recall would silently drop. IDs must be globally unique
    across batches; equal-id hits are the same row re-screened and are
    excluded."""

    _META_PROP = "faisssearcher.fingerprint.meta"
    _BUCKET_COL = "band_key"

    def __init__(self, spark: SparkSession, path: str, *,
                 bits: int = 64, max_hamming: int = 3,
                 bucketed_table: "str | None" = None,
                 n_buckets: int = 64, layout: str = "flat"):
        if not 1 <= bits <= 64:
            raise ValueError(f"bits must be in [1, 64]; got {bits}")
        if not 0 <= max_hamming < bits:
            raise ValueError(
                f"max_hamming must be in [0, bits); got {max_hamming}")
        self.bits = int(bits)
        self.max_hamming = int(max_hamming)
        super().__init__(spark, path, bucketed_table=bucketed_table,
                         n_buckets=n_buckets, layout=layout)

    def _meta_dict(self) -> dict:
        return {"bits": self.bits, "max_hamming": self.max_hamming}

    def _band_rows(self, fps: DataFrame, id_col: str,
                   fp_col: str) -> DataFrame:
        """``(id, band_key, fp)`` — one row per (fingerprint, band),
        via the SHARED banding kernel (dedup.hamming_band_rows — batch
        pairs, this store, its streaming sink, and the video path all
        band through one definition, so state can never drift)."""
        from faisssearcher_spark.operators.dedup import hamming_band_rows

        return hamming_band_rows(fps, id_col=id_col, fp_col=fp_col,
                                 bits=self.bits,
                                 max_hamming=self.max_hamming,
                                 fold_key=True)

    # -- API ---------------------------------------------------------------

    def commit(self, fps: DataFrame, *, id_col: str = "id",
               fp_col: str = "fp") -> None:
        """Append the batch's banded fingerprint rows to the state (see
        ``_IncrementalStore._append_state`` for replay semantics)."""
        self._append_state(self._band_rows(fps, id_col, fp_col))

    def upsert(self, fps: DataFrame, *, id_col: str = "id",
               fp_col: str = "fp") -> None:
        """MERGE the batch by fingerprint id: committed band rows for
        these ids are deleted and replaced by the batch's (see
        ``_IncrementalStore._merge_state`` for the rewrite contract)."""
        self._merge_state(self._band_rows(fps, id_col, fp_col),
                          fps.select(F.col(id_col).alias("id")))

    def screen(self, fps: DataFrame, *, id_col: str = "id",
               fp_col: str = "fp",
               max_hamming: "int | None" = None) -> DataFrame:
        """``(new_id, known_id, hamming)`` for every batch fingerprint
        within ``max_hamming`` bits (default: the store's) of a
        committed one — candidates from the banded equi-join, verified
        with XOR + popcount; the n×|history| space is never formed."""
        h = self.max_hamming if max_hamming is None else int(max_hamming)
        if h < 0:
            raise ValueError(
                f"screen radius must be >= 0 (got {h}) — a negative "
                "radius matches nothing and filter_new would silently "
                "pass every near-duplicate as new")
        if h > self.max_hamming:
            raise ValueError(
                f"screen radius {h} exceeds the store's banding "
                f"guarantee (built for max_hamming="
                f"{self.max_hamming}); pairs beyond it could share no "
                "band and recall would silently drop — rebuild the "
                "store with the wider radius")
        new = self._band_rows(fps, id_col, fp_col)
        known = self.state()
        if known is None:
            return (new.select(F.col("id").alias("new_id"),
                               F.col("id").alias("known_id"),
                               F.lit(0).alias("hamming"))
                    .limit(0))
        # band-density guard on the STATE side (review catch: the
        # store is the consumer whose corpus grows without bound —
        # hamming_pairs warns, the screen should too). The state holds
        # one row per (fingerprint, band); estimate fingerprints as
        # rows / n_bands. Advisory, estimate-based, results untouched.
        from faisssearcher_spark.operators.dedup import (
            BAND_DENSITY_WARN_RATIO, _estimate_rows, hamming_band_widths)

        widths = hamming_band_widths(self.bits, self.max_hamming)
        width = min(widths)
        est = _estimate_rows(known)
        if (width < 62 and est is not None
                and est // len(widths)
                > BAND_DENSITY_WARN_RATIO * (1 << width)):
            import warnings
            warnings.warn(
                f"FingerprintStore.screen: ~{est // len(widths)} "
                f"committed fingerprints over {width}-bit bands "
                f"(bits={self.bits}, max_hamming={self.max_hamming}) — "
                "the banded candidate join is effectively quadratic at "
                "this state size; rebuild the store with wider bits "
                "(keep bits ≳ log2(n)·(max_hamming+1)).",
                RuntimeWarning, stacklevel=2)
        return (new.alias("n")
                .join(known.alias("k"),
                      (F.col("n.band_key") == F.col("k.band_key"))
                      & (F.col("n.id") != F.col("k.id")))
                .select(F.col("n.id").alias("new_id"),
                        F.col("k.id").alias("known_id"),
                        F.bit_count(F.col("n.fp")
                                    .bitwiseXOR(F.col("k.fp")))
                        .alias("hamming"))
                .filter(F.col("hamming") <= h)
                .dropDuplicates(["new_id", "known_id"]))

    def filter_new(self, fps: DataFrame, *, id_col: str = "id",
                   fp_col: str = "fp",
                   max_hamming: "int | None" = None) -> DataFrame:
        """The batch minus every fingerprint screened as a near-dup of
        committed history — one anti-join on the screen hits."""
        hits = self.screen(fps, id_col=id_col, fp_col=fp_col,
                           max_hamming=max_hamming) \
            .select(F.col("new_id").alias(id_col)).distinct()
        return fps.join(hits, id_col, "left_anti")
