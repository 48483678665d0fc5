"""Materialize a pure-python protobuf runtime for transformWithState.

This environment has no protobuf wheel and no network, but the Google
Cloud SDK (present on the image) bundles the pure-python protobuf
runtime (BSD-licensed, upstream `google.protobuf` 4.23.2) under a
rewritten package name. This tool copies it into
``.cache/pyshims/google/protobuf``, reverses the ``cloudsdk.google``
import rewrite, and adds the one module the 4.x runtime lacks that
Spark 4.1's protoc-6.33 gencode imports: ``runtime_version`` (whose
only job is a version check — no-op'd here; the gencode itself uses
only ``descriptor_pool.AddSerializedFile`` + ``internal.builder``,
both present and wire-compatible since protobuf 4.21).

Usage:
    python tools/vendor_protobuf.py          # build .cache/pyshims
    PYTHONPATH=$REPO/.cache/pyshims pytest tests/ ...

PYTHONPATH (not sys.path.insert) is load-bearing: transformWithState's
state-server client runs in the forked Python WORKER processes, which
inherit the env, not the driver's sys.path mutations.

Verified here: both transformWithState pytest gates pass with this
shim + the RocksDB state-store provider (see
tests/test_media_streaming.py::rocksdb_state).
"""

from __future__ import annotations

import os
import re
import shutil
import sys

GCLOUD_PB = "/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk/google/protobuf"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIM_ROOT = os.path.join(REPO, ".cache", "pyshims")
DST = os.path.join(SHIM_ROOT, "google", "protobuf")

_RUNTIME_VERSION_SHIM = '''\
"""Shim: protobuf>=5.27 gencode on the vendored 4.23 pure-python
runtime (see tools/vendor_protobuf.py). The real module only validates
gencode-vs-runtime version skew; the gencode APIs Spark's generated
StateMessage_pb2 uses are present and wire-compatible in 4.23. The
check is not a blanket no-op (ADVICE r6): gencode declaring a major
beyond the range this shim was validated against fails HERE with the
actual skew, not downstream with an obscure AttributeError."""
from enum import Enum

#: gencode majors the vendored 4.23 runtime is known wire- and
#: API-compatible with (Spark 4.1's StateMessage gencode declares
#: 6.33.0 and runs green on it across full rounds of streaming tests)
_MAX_KNOWN_COMPATIBLE_MAJOR = 6


class Domain(Enum):
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


def ValidateProtobufRuntimeVersion(domain, major, minor, patch, suffix, location):
    if major > _MAX_KNOWN_COMPATIBLE_MAJOR:
        raise ImportError(
            f"protobuf gencode at {location} declares runtime_version "
            f"{major}.{minor}.{patch}, beyond the vendored pure-python "
            f"4.23 runtime's validated range (gencode majors <= "
            f"{_MAX_KNOWN_COMPATIBLE_MAJOR}) - re-vendor a newer runtime "
            f"(tools/vendor_protobuf.py)"
        )
    return None
'''


def build(force: bool = False) -> str | None:
    """Build the shim tree; returns its PYTHONPATH root, or None if the
    gcloud SDK source is absent (callers treat that as 'keep skipping')."""
    if not os.path.isdir(GCLOUD_PB):
        return None
    marker = os.path.join(DST, "runtime_version.py")
    if os.path.exists(marker) and not force:
        # rebuild when the shim source here has moved on from what the
        # cached tree carries (e.g. the version-skew guard landing)
        with open(marker, encoding="utf-8") as fh:
            if fh.read() == _RUNTIME_VERSION_SHIM:
                return SHIM_ROOT
    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(os.path.dirname(DST), exist_ok=True)
    shutil.copytree(
        GCLOUD_PB, DST, ignore=shutil.ignore_patterns("__pycache__")
    )
    # 'google' stays an IMPLICIT NAMESPACE package (no __init__.py), the
    # same shape upstream protobuf ships: a regular package anywhere on
    # sys.path would shadow every other google.* namespace portion
    # (google-auth, googleapis-common-protos, ...) regardless of path
    # order — a namespace portion merges with them instead
    init = os.path.join(SHIM_ROOT, "google", "__init__.py")
    if os.path.exists(init):
        os.remove(init)
    # reverse the SDK's package rewrite so absolute imports resolve
    pat = re.compile(r"\bcloudsdk\.google\.protobuf\b")
    for root, _dirs, files in os.walk(DST):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            p = os.path.join(root, fn)
            src = open(p, encoding="utf-8").read()
            new = pat.sub("google.protobuf", src)
            if new != src:
                open(p, "w", encoding="utf-8").write(new)
    open(marker, "w").write(_RUNTIME_VERSION_SHIM)
    return SHIM_ROOT


def main() -> int:
    root = build(force="--force" in sys.argv)
    if root is None:
        print("gcloud SDK protobuf not found; nothing vendored")
        return 1
    print(f"pure-python protobuf shim at: {root}")
    print(f"use: PYTHONPATH={root} python -m pytest tests/ -k transform_with_state")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
