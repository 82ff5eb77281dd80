"""Optimistic-concurrency commit log for published table artifacts —
the transactional stand-in for a Delta/Iceberg commit while those jars
are absent, with the SAME protocol shape so the swap-for-commit upgrade
is a call-site change, not a redesign.

The directory-rename publish (streaming/incremental.swap_directory)
is atomic for ONE writer but has no concurrent-writer story: two
maintainers publishing the same view race their renames and the loser's
output silently vanishes (or worse, interleaves .old cleanup). Table
formats solve this with OPTIMISTIC concurrency: writers prepare
immutable data files, then commit by atomically creating the next
numbered log entry; exactly one creator wins, losers rebase and retry.
This module is that protocol on a filesystem:

    table_root/
      _commits/00000000.json   # manifest: version, file list, base, meta
      _commits/00000001.json
      v00000000-<uuid>/        # immutable parquet data directories
      v00000001-<uuid>/

- ``commit`` creates ``_commits/{N}.json`` with O_CREAT|O_EXCL — the
  put-if-absent primitive (atomic on POSIX for threads AND processes;
  on S3 the same role is played by conditional PUT, on HDFS by
  create-no-overwrite — exactly what Delta's LogStore abstracts).
- A manifest names the table's FULL FILE LIST at that version
  (Iceberg's snapshot shape; Delta reconstructs the same list from
  add/remove actions). ``commit`` replaces the list with the staged
  dir's files; ``commit_append`` links the staged dir's files onto the
  BASE version's list, so an appending writer stages and moves only
  the increment — commit cost is O(batch), never an O(table) rewrite.
  Pre-files manifests (``data_dir`` only) stay readable: their list is
  the dir's parquet scan, folded forward by the first append on top.
- A reader resolves the highest manifest and reads its file list.
  Committed files are IMMUTABLE and fully written BEFORE the manifest
  exists, so a reader can never observe a torn table — the
  no-torn-reads guarantee the rename swap only approximates.
- A crash between staging and commit leaves an orphaned staging dir and
  an intact live table; ``vacuum`` removes dirs none of whose files are
  referenced by a retained manifest.

Write-skew note: ``commit(base_version=...)`` fails unless the caller's
base IS the latest version — the serializable-writer check. A retrying
writer must re-read the table and REBUILD its output against the new
base (see ``commit_retry``), not blindly re-attempt the same bytes.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_COMMITS = "_commits"


class CommitConflict(RuntimeError):
    """Another writer committed this version first — re-read, rebase,
    retry (or surface the loss; never ignore)."""


class VersionedTable:
    """A filesystem table published through numbered manifest commits."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(os.path.join(root, _COMMITS), exist_ok=True)

    # -- log ---------------------------------------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, _COMMITS, f"{version:08d}.json")

    def latest_version(self) -> int:
        """Highest committed version, -1 when the table is empty."""
        best = -1
        try:
            names = os.listdir(os.path.join(self.root, _COMMITS))
        except FileNotFoundError:
            return -1
        for n in names:
            if n.endswith(".json"):
                try:
                    best = max(best, int(n[:-5]))
                except ValueError:
                    continue
        return best

    def read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def data_path(self, version: int | None = None) -> str:
        """The single data dir of a REPLACE commit (legacy accessor).
        Append commits span several dirs — use ``files``/``read``."""
        v = self.latest_version() if version is None else version
        if v < 0:
            raise FileNotFoundError(f"no commits under {self.root}")
        m = self.read_manifest(v)
        if "data_dir" not in m:
            raise ValueError(
                f"version {v} of {self.root} is an append commit spanning "
                "several data dirs; read it through files()/read()"
            )
        return os.path.join(self.root, m["data_dir"])

    def _scan_parquet(self, rel_dir: str) -> list[str]:
        """Root-relative paths of every parquet file under ``rel_dir``."""
        out = []
        top = os.path.join(self.root, rel_dir)
        for dirpath, _, names in os.walk(top):
            for n in names:
                if n.endswith(".parquet"):
                    out.append(
                        os.path.relpath(
                            os.path.join(dirpath, n), self.root
                        )
                    )
        return sorted(out)

    def _manifest_files(self, manifest: dict) -> list[str]:
        """Root-relative file list of a manifest; legacy data_dir-only
        manifests resolve to the dir's parquet scan (immutable once
        committed, so the scan is stable)."""
        if "files" in manifest:
            return manifest["files"]
        return self._scan_parquet(manifest["data_dir"])

    def files(
        self, version: int | None = None, sub: str | None = None
    ) -> list[str]:
        """Absolute paths of the parquet files making up ``version``
        (default latest). ``sub`` selects one logical leg of a
        multi-artifact table: the files a writer staged under
        ``<staging>/<sub>/`` (path segment right after the version
        dir)."""
        v = self.latest_version() if version is None else version
        if v < 0:
            raise FileNotFoundError(f"no commits under {self.root}")
        rel = self._manifest_files(self.read_manifest(v))
        if sub is not None:
            rel = [
                f
                for f in rel
                if f.split(os.sep)[1:2] == [sub]
            ]
        return [os.path.join(self.root, f) for f in rel]

    # -- write path --------------------------------------------------
    def stage(self) -> str:
        """A fresh, uniquely named directory to write the candidate
        data into. The uuid name doubles as the committed data_dir, so
        a successful commit is pure metadata — no second data copy."""
        d = os.path.join(self.root, f"staging-{uuid.uuid4().hex}")
        os.makedirs(d)
        return d

    def commit(
        self,
        staged_dir: str,
        base_version: int,
        meta: dict | None = None,
    ) -> int:
        """Atomically publish ``staged_dir`` as version
        ``base_version + 1``, REPLACING the table's contents (the file
        list is exactly the staged dir's files). Raises CommitConflict
        when that version already exists (another writer won) OR when
        newer commits landed past the caller's base — both mean the
        caller's output was derived from a stale read and must be
        rebuilt."""
        return self._commit(staged_dir, base_version, meta, append=False)

    def commit_append(
        self,
        staged_dir: str,
        base_version: int,
        meta: dict | None = None,
        replace_subs: tuple[str, ...] = (),
    ) -> int:
        """Atomically publish ``staged_dir`` as version
        ``base_version + 1`` whose file list is the BASE version's list
        plus the staged files — the append-granular commit: the caller
        stages only the increment, the data dirs of prior versions are
        linked by reference, and commit cost is O(increment) regardless
        of table size (Delta's add-actions / Iceberg's fast append).

        ``replace_subs``: legs (first path segment under the staged
        dir) whose BASE files are dropped instead of carried — the
        per-leg compaction primitive: stage a rewritten ``labels/`` and
        pass ``replace_subs=("labels",)`` to swap that leg while the
        other legs ride along untouched.

        Same conflict contract as ``commit``; on CommitConflict the
        staged increment is intact and may be re-submitted against the
        new base (an append depends only on the batch, so no rebuild is
        needed unless the caller's meta derivation was base-dependent)."""
        return self._commit(
            staged_dir, base_version, meta,
            append=True, replace_subs=replace_subs,
        )

    def _commit(
        self,
        staged_dir: str,
        base_version: int,
        meta: dict | None,
        append: bool,
        replace_subs: tuple[str, ...] = (),
    ) -> int:
        version = base_version + 1
        if append and base_version >= 0:
            base_files = self._manifest_files(
                self.read_manifest(base_version)
            )
            if replace_subs:
                drop = set(replace_subs)
                base_files = [
                    f
                    for f in base_files
                    if (f.split(os.sep)[1:2] or [None])[0] not in drop
                ]
        else:
            base_files = []
        final_name = f"v{version:08d}-{uuid.uuid4().hex[:8]}"
        final_dir = os.path.join(self.root, final_name)
        os.rename(staged_dir, final_dir)  # still invisible to readers
        # refresh mtime so vacuum's grace window covers the commit
        # attempt even when staging the data took longer than the grace
        os.utime(final_dir)
        files = base_files + self._scan_parquet(final_name)
        manifest = {
            "version": version,
            "base_version": base_version,
            "files": files,
            **({} if append else {"data_dir": final_name}),
            **({"meta": meta} if meta else {}),
        }
        # Write the manifest COMPLETELY to a private temp name, then
        # hard-link it into place: link() is the put-if-absent CAS
        # (fails with FileExistsError when the version exists) AND the
        # linked name appears with its full content in one step. A bare
        # O_CREAT|O_EXCL create-then-write would let a concurrent
        # reader list the manifest and read it EMPTY — a torn manifest,
        # caught live by the no-torn-reads test's reader threads. The
        # temp name does not end in .json, so latest_version never
        # counts it.
        final_path = self._manifest_path(version)
        tmp_path = f"{final_path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp_path, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp_path, final_path)
        except FileExistsError:
            # the losing side of the race: withdraw the data dir so
            # vacuum has less to do, then tell the caller to rebase.
            # The rename-back can itself lose to a vacuum that collected
            # the aged loser dir (its v-number is <= latest, so the
            # in-flight protection doesn't cover it) — the caller must
            # still see CommitConflict, never FileNotFoundError, or the
            # rebase loop dies.
            try:
                os.rename(final_dir, staged_dir)
            except FileNotFoundError:
                pass  # vacuumed under us; the increment must be rebuilt
            raise CommitConflict(
                f"version {version} already committed under {self.root}"
            ) from None
        finally:
            os.unlink(tmp_path)
        return version

    def commit_retry(self, build, max_attempts: int = 10) -> int:
        """Serializable-writer loop: ``build(latest_version, staged_dir)``
        writes the candidate output (derived from the CURRENT latest
        version — the rebase) into ``staged_dir``; on conflict the
        build runs again against the new latest. Raises after
        ``max_attempts`` conflicts rather than spinning forever."""
        last: CommitConflict | None = None
        for _ in range(max_attempts):
            base = self.latest_version()
            staged = self.stage()
            build(base, staged)
            try:
                return self.commit(staged, base)
            except CommitConflict as e:
                last = e
                import shutil

                shutil.rmtree(staged, ignore_errors=True)
        raise CommitConflict(
            f"gave up after {max_attempts} conflicting attempts"
        ) from last

    # -- maintenance ---------------------------------------------------
    def vacuum(
        self, keep_last: int = 2, grace_seconds: float = 600.0
    ) -> list[str]:
        """Remove data dirs none of whose files are referenced by the
        last ``keep_last`` commits, plus orphaned staging dirs (crash
        debris). Returns the removed names. Readers of retained
        versions are unaffected — referenced files are immutable.

        File granularity: append commits carry prior versions' files
        forward by reference, so a dir stays live as long as ANY
        retained manifest lists a file inside it — under pure append
        nothing is ever collected (correct: every byte is still part of
        the live table) until a compacting replace commit ages the old
        dirs out of the retention window.

        Concurrent-writer safety (vacuum may race live commits — the
        maintainers call it after every batch):

        - A data dir whose version number is >= ``latest_version()``
          is potentially an in-flight commit: ``commit()`` renames the
          staging dir to its final v-name BEFORE linking the manifest,
          so in that window the dir is unreferenced but about to become
          live — and a LOSING commit's dir briefly sits at exactly
          ``latest`` before being renamed back. Never removed,
          regardless of age.
        - Anything else unreferenced is only removed when its mtime is
          older than ``grace_seconds`` — a concurrent writer's live
          staging dir is always younger than the grace window (commit
          refreshes the final dir's mtime), while genuine crash debris
          ages past it. ``grace_seconds=0`` restores eager collection
          for single-writer offline cleanup.
        """
        import re
        import shutil
        import time

        latest = self.latest_version()
        keep_dirs = set()
        for v in range(max(0, latest - keep_last + 1), latest + 1):
            try:
                manifest = self.read_manifest(v)
            except FileNotFoundError:
                continue
            if "data_dir" in manifest:
                keep_dirs.add(manifest["data_dir"])
            for f in manifest.get("files", ()):
                keep_dirs.add(f.split(os.sep, 1)[0])
        now = time.time()
        removed = []
        for name in os.listdir(self.root):
            if name == _COMMITS or name in keep_dirs:
                continue
            m = re.match(r"^v(\d{8})-", name)
            if m and int(m.group(1)) >= latest:
                continue  # in-flight or losing commit, not yet resolved
            full = os.path.join(self.root, name)
            if not os.path.isdir(full):
                continue
            try:
                if now - os.path.getmtime(full) < grace_seconds:
                    continue  # presumed live (racing writer), not debris
            except OSError:
                continue  # vanished under us — a later pass gets it
            shutil.rmtree(full, ignore_errors=True)
            removed.append(name)
        return removed

    # -- Spark convenience ----------------------------------------------
    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        sub: str | None = None,
    ) -> DataFrame | None:
        """The table (or one ``sub`` leg of it) at ``version``. Returns
        None when the version has no files for the requested leg — the
        caller supplies the empty frame (it knows the schema)."""
        fl = self.files(version, sub=sub)
        if not fl:
            return None
        return spark.read.parquet(*fl)

    def write_commit(
        self,
        df: DataFrame,
        base_version: int | None = None,
        meta: dict | None = None,
    ) -> int:
        """Stage ``df`` as parquet and commit it as the table's FULL
        contents. With the default ``base_version=None`` the df is
        assumed derived from the current latest (read just before
        calling); pass an explicit base when the derivation read
        happened earlier."""
        base = self.latest_version() if base_version is None else base_version
        staged = self.stage()
        df.write.mode("overwrite").parquet(staged)
        return self.commit(staged, base, meta=meta)
