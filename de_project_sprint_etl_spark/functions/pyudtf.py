"""Python UDTFs (Spark 4 user-defined table functions) — the ESCAPE
HATCH tier, not the default.

A UDTF is the right tool when per-row fan-out logic genuinely cannot be
expressed with Catalyst primitives (explode/sequence/inline/posexplode
or higher-order array functions): external parsers, stateful per-row
generators, libraries. It runs in a Python worker (row pickling or
Arrow), so it forfeits whole-stage codegen — every native op in this
package is preferred where one exists.

``ChunkText`` here deliberately duplicates functions/text.py's NATIVE
``chunk_documents`` semantics so the two can be pinned row-identical in
tests and against the same DuckDB oracle: it proves the UDTF plumbing
(lateral join, outer args, multi-row yield) end-to-end while making the
performance hierarchy measurable — same answer, native explode plan vs
Python table function.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id int, chunk_start int, chunk_text string")
class ChunkText:
    """Overlapping fixed-width character chunks; exact twin of
    functions/text.chunk_documents (chunk i covers
    [i*stride, i*stride+size), n_chunks = max(1,
    ceil((len-overlap)/stride)))."""

    def eval(self, text, size: int, overlap: int):  # noqa: ANN001
        stride = size - overlap
        n = len(text) if text else 0
        n_chunks = max(1, (n - overlap + stride - 1) // stride)
        for i in range(n_chunks):
            yield i, i * stride, (text or "")[i * stride : i * stride + size]
