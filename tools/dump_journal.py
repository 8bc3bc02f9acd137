"""Offline journal introspection — the ``DumpJournal`` analog.

Reference: ``bigdata-core/bigdata/src/java/com/bigdata/journal/
DumpJournal.java`` (dumps the commit-record chain, index sizes, and
allocator stats of a journal file without opening a full database).
This tool does the same for a :class:`database_spark.journal.Journal`
directory WITHOUT a SparkSession: the pointer file and the immutable
version/delta parquet directories are plain files, so everything reads
through json + pyarrow footer metadata (row counts and byte sizes come
from parquet footers — no data scan).

Usage::

    python tools/dump_journal.py <journal_dir> [--json]

Reports, per version in the commit chain (1..head):

* kind — full | delta | empty (pointer kinds map, falling back to a
  directory probe for entries pruned by full-materialization hygiene,
  exactly like ``Journal._kind_of``)
* rows — total statement rows in a full version; inserts/tombstones
  split (op=0/op=1) for a delta
* bytes — on-disk parquet bytes
* files — parquet part files

plus journal-level stats: head version, full-materialization cadence
(versions between full snapshots), reconstruction depth of the head
(deltas folded over the nearest full base — the read-amplification
number), total bytes, and DANGLING directories: version/delta dirs
above the head or of the wrong kind, the crash residue of a commit
that wrote data but lost the pointer swap race (safe to delete; the
tool only reports).
"""

from __future__ import annotations

import json
import os
import sys


def _dir_stats(path: str) -> dict:
    """rows/bytes/files of one parquet directory from footers only.
    Underscore-prefixed subdirectories (``_text_index``, ...) are
    auxiliary structures a Spark reader ignores — their bytes count,
    their rows do not (they would double the statement count)."""
    import pyarrow.parquet as pq

    rows = 0
    size = 0
    files = 0
    for root, dirs, names in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for n in names:
            fp = os.path.join(root, n)
            if n.endswith(".parquet"):
                rows += pq.ParquetFile(fp).metadata.num_rows
                files += 1
            size += os.path.getsize(fp)
    return {"rows": rows, "bytes": size, "files": files}


def _delta_ops(path: str) -> dict:
    """insert/tombstone split of a delta dir (reads ONLY the op column)."""
    import pyarrow.parquet as pq

    ins = rem = 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            if not n.endswith(".parquet"):
                continue
            col = pq.read_table(os.path.join(root, n), columns=["op"])["op"]
            for chunk in col.chunks:
                for v in chunk:
                    if v.as_py() == 0:
                        ins += 1
                    else:
                        rem += 1
    return {"inserts": ins, "tombstones": rem}


def dump_journal(path: str) -> dict:
    """Machine-readable dump of a journal directory (see module doc)."""
    path = path.rstrip("/")
    head_file = os.path.join(path, "_head.json")
    meta = None
    if os.path.exists(head_file):
        with open(head_file) as fh:
            meta = json.load(fh)
    head = int(meta["version"]) if meta else 0
    kinds = (meta or {}).get("kinds") or {}

    def vdir(v: int) -> str:
        return os.path.join(path, "versions", f"v{v:08d}")

    def ddir(v: int) -> str:
        return os.path.join(path, "deltas", f"d{v:08d}")

    def kind_of(v: int) -> str:
        k = kinds.get(str(v))
        if k is not None:
            return k
        if os.path.isdir(vdir(v)):
            return "full"
        if os.path.isdir(ddir(v)):
            return "delta"
        return "empty"

    def layouts_of(v: int) -> list:
        """Index layouts a full version materialized: 'p' when the
        primary is p_bucket-partitioned, 's'/'o' for the companion
        ``_s_index``/``_o_index`` permutation copies.  Deltas carry no
        layout of their own — ``open()`` folds the same delta frames
        into EVERY layout the base carries (the SPORelation analog of
        one mutation updating all key orders)."""
        d = vdir(v)
        out = []
        try:
            if any(n.startswith("p_bucket=") for n in os.listdir(d)):
                out.append("p")
        except OSError:
            return out
        if os.path.isdir(os.path.join(d, "_s_index")):
            out.append("s")
        if os.path.isdir(os.path.join(d, "_o_index")):
            out.append("o")
        if os.path.isdir(os.path.join(d, "_g_index")):
            out.append("g")
        return out

    versions = []
    last_full = 0
    full_gaps = []
    for v in range(1, head + 1):
        k = kind_of(v)
        ent: dict = {"version": v, "kind": k}
        if k == "full":
            ent.update(_dir_stats(vdir(v)))
            ent["layouts"] = layouts_of(v)
            # a MIXED version: incremental compaction cloned the base's
            # untouched bucket dirs and rewrote only the touched ones
            # (journal meta records which — Journal._compact_incremental)
            mfile = os.path.join(vdir(v), "_dbspark_meta.json")
            if os.path.exists(mfile):
                try:
                    with open(mfile) as fh:
                        comp = json.load(fh).get("compaction")
                    if comp:
                        ent["compaction"] = comp
                except (OSError, ValueError):
                    pass
            if last_full:
                full_gaps.append(v - last_full)
            last_full = v
        elif k == "delta":
            ent.update(_dir_stats(ddir(v)))
            ent.update(_delta_ops(ddir(v)))
            # one delta chain serves every layout: the fold applies the
            # frames to the p-, s-, and o-keyed copies alike
            ent["layout_scope"] = "all"
        versions.append(ent)

    # head reconstruction depth: deltas folded over the nearest full
    # base when open() replays the head (the read-amplification number)
    depth = 0
    v = head
    while v > 0 and kind_of(v) != "full":
        if kind_of(v) == "delta":
            depth += 1
        v -= 1

    # dangling dirs: data written past the head pointer (a crashed
    # commit that lost the swap), or a version dir whose kind the
    # pointer contradicts
    dangling = []
    for sub, pref in (("versions", "v"), ("deltas", "d")):
        root = os.path.join(path, sub)
        if not os.path.isdir(root):
            continue
        for name in sorted(os.listdir(root)):
            if not name.startswith(pref):
                continue
            try:
                v = int(name[1:])
            except ValueError:
                continue
            if v > head:
                dangling.append(os.path.join(sub, name))
            elif kinds.get(str(v)) not in (None, "full" if pref == "v" else "delta"):
                dangling.append(os.path.join(sub, name))

    return {
        "path": path,
        "head": head,
        "head_ts": (meta or {}).get("ts"),
        "head_message": (meta or {}).get("message"),
        "versions": versions,
        "head_reconstruction_depth": depth,
        "full_materialization_gaps": full_gaps,
        "total_bytes": sum(e.get("bytes", 0) for e in versions),
        "dangling": dangling,
    }


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--json"]
    as_json = "--json" in sys.argv
    if not args:
        print(__doc__)
        return 2
    rep = dump_journal(args[0])
    if as_json:
        print(json.dumps(rep, indent=1))
        return 0
    print(f"journal {rep['path']}: head v{rep['head']}"
          f" ({rep['head_message'] or 'no message'})")
    print(f"  head reconstruction: {rep['head_reconstruction_depth']} delta"
          f" fold(s) over the nearest full base")
    if rep["full_materialization_gaps"]:
        gaps = rep["full_materialization_gaps"]
        print(f"  full-materialization cadence: every"
              f" {'/'.join(str(g) for g in gaps)} versions")
    print(f"  total bytes: {rep['total_bytes']}")
    for e in rep["versions"]:
        extra = ""
        if e["kind"] == "delta":
            extra = f"  +{e['inserts']} -{e['tombstones']} (all layouts)"
        if "rows" in e:
            extra += f"  rows={e['rows']} bytes={e['bytes']}"
        if e.get("layouts"):
            extra += f"  layouts={','.join(e['layouts'])}"
        if e.get("compaction"):
            c = e["compaction"]
            rew = ",".join(
                f"{k}:{len(v)}" for k, v in (c.get("rewritten") or {}).items() if v
            )
            extra += f"  incremental(base=v{c.get('base')} rewrote {rew} buckets)"
        print(f"  v{e['version']:>4} {e['kind']:<5}{extra}")
    for d in rep["dangling"]:
        print(f"  DANGLING {d} (data past the head pointer — crash residue)")
    return 1 if rep["dangling"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
