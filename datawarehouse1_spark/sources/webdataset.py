"""WebDataset-style tar shards in pure stdlib.

Large image-text training sets ship as POSIX tar shards where files
sharing a basename form one sample ("000123.txt" + "000123.json" +
"000123.png" => sample 000123 with text, metadata, and image members —
the WebDataset convention). The container is plain tar (stdlib
`tarfile`); what the pipeline needs is the SAMPLE GROUPING walk plus
typed member decoding, which is what this module implements:

  * parse_tar_samples — stream the tar, group members by basename into
    ordered samples (extension -> bytes maps);
  * build_tar_shard — the deterministic fixture writer (zeroed
    mtime/uid/gid, sorted members, ustar format => byte-stable output);
  * Spark side (queries/wds_ext.py): shards are synthesized
    executor-side from the documents table — text + JSON metadata +
    a real PNG for even ids — then q_wds_extract_samples must run the
    full chain (tar walk, grouping, JSON parse, PNG decode check) to
    reproduce a plain DuckDB projection of the source table.

Pure bytes — safe inside Arrow-batched executors.
"""

from __future__ import annotations

import io
import json
import tarfile


def parse_tar_samples(payload: bytes) -> list[tuple[str, dict[str, bytes]]]:
    """tar bytes -> [(sample_key, {ext: member_bytes})], grouped by
    basename in archive order (the WebDataset sample convention:
    consecutive members sharing a basename form one sample)."""
    samples: list[tuple[str, dict[str, bytes]]] = []
    current_key: str | None = None
    current: dict[str, bytes] = {}
    with tarfile.open(fileobj=io.BytesIO(payload), mode="r:") as tf:
        for member in tf:
            if not member.isfile():
                continue
            name = member.name.rsplit("/", 1)[-1]
            key, _, ext = name.partition(".")
            if key != current_key:
                if current_key is not None:
                    samples.append((current_key, current))
                current_key, current = key, {}
            fobj = tf.extractfile(member)
            current[ext] = fobj.read() if fobj is not None else b""
    if current_key is not None:
        samples.append((current_key, current))
    return samples


def build_tar_shard(samples: list[tuple[str, dict[str, bytes]]]) -> bytes:
    """[(key, {ext: bytes})] -> deterministic POSIX tar bytes (zeroed
    timestamps/owners, members emitted in given order, exts sorted)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for key, members in samples:
            for ext in sorted(members):
                data = members[ext]
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def sample_metadata(members: dict[str, bytes]) -> dict:
    """Parse the sample's .json sidecar (WebDataset metadata member)."""
    raw = members.get("json")
    return json.loads(raw.decode("utf-8")) if raw else {}
