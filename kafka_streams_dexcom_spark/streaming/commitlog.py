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
      _commits/00000000.json   # manifest: version, data dir, base, meta
      _commits/00000001.json
      v00000000-<uuid>/        # immutable parquet data directories
      v00000001-<uuid>/

- ``commit`` creates ``_commits/{N}.json`` with O_CREAT|O_EXCL — the
  put-if-absent primitive (atomic on POSIX for threads AND processes;
  on S3 the same role is played by conditional PUT, on HDFS by
  create-no-overwrite — exactly what Delta's LogStore abstracts).
- A reader resolves the highest manifest and reads its data dir. Data
  dirs are IMMUTABLE once committed and fully written BEFORE the
  manifest exists, so a reader can never observe a torn table — the
  no-torn-reads guarantee the rename swap only approximates.
- A crash between staging and commit leaves an orphaned staging dir and
  an intact live table; ``vacuum`` removes unreferenced dirs.

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
        v = self.latest_version() if version is None else version
        if v < 0:
            raise FileNotFoundError(f"no commits under {self.root}")
        return os.path.join(self.root, self.read_manifest(v)["data_dir"])

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
        ``base_version + 1``. Raises CommitConflict when that version
        already exists (another writer won) OR when newer commits
        landed past the caller's base — both mean the caller's output
        was derived from a stale read and must be rebuilt."""
        version = base_version + 1
        final_name = f"v{version:08d}-{uuid.uuid4().hex[:8]}"
        final_dir = os.path.join(self.root, final_name)
        os.rename(staged_dir, final_dir)  # still invisible to readers
        manifest = {
            "version": version,
            "base_version": base_version,
            "data_dir": final_name,
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
            # vacuum has less to do, then tell the caller to rebase
            os.rename(final_dir, staged_dir)
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
        """Remove data dirs not referenced by the last ``keep_last``
        commits, plus orphaned staging dirs (crash debris). Returns the
        removed names. Readers of retained versions are unaffected —
        referenced dirs are immutable.

        Concurrent-writer safety (vacuum may race live commits — the
        maintainers call it after every batch):

        - A data dir whose version number EXCEEDS ``latest_version()``
          is an in-flight commit: ``commit()`` renames the staging dir
          to its final v-name BEFORE linking the manifest, so in that
          window the dir is unreferenced but about to become live.
          Never removed, regardless of age.
        - Anything else unreferenced is only removed when its mtime is
          older than ``grace_seconds`` — a concurrent writer's live
          staging dir is always younger than the grace window, while
          genuine crash debris ages past it. ``grace_seconds=0``
          restores eager collection for single-writer offline cleanup.
        """
        import re
        import shutil
        import time

        latest = self.latest_version()
        keep_dirs = set()
        for v in range(max(0, latest - keep_last + 1), latest + 1):
            try:
                keep_dirs.add(self.read_manifest(v)["data_dir"])
            except FileNotFoundError:
                continue
        now = time.time()
        removed = []
        for name in os.listdir(self.root):
            if name == _COMMITS or name in keep_dirs:
                continue
            m = re.match(r"^v(\d{8})-", name)
            if m and int(m.group(1)) > latest:
                continue  # in-flight commit, manifest not linked yet
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
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        return spark.read.parquet(self.data_path(version))

    def write_commit(
        self,
        df: DataFrame,
        base_version: int | None = None,
        meta: dict | None = None,
    ) -> int:
        """Stage ``df`` as parquet and commit it. With the default
        ``base_version=None`` the df is assumed derived from the
        current latest (read just before calling); pass an explicit
        base when the derivation read happened earlier."""
        base = self.latest_version() if base_version is None else base_version
        staged = self.stage()
        df.write.mode("overwrite").parquet(staged)
        return self.commit(staged, base, meta=meta)
