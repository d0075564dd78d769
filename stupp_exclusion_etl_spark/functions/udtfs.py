"""Python UDTFs (Spark 4 user-defined TABLE functions) — the third leg
of the UDF surface (B15: scalar UDF for guarded coercion, pandas UDFs
for media decode, and now a table function for per-row fan-out).

A UDTF is the right API when one input row yields a VARIABLE number of
output rows with per-row Python logic — the lateral-join shape. Here it
re-expresses sliding-window chunking (corpus_sliding_chunks' semantics)
so the two mechanisms can be differentially tested against one oracle.
The tokens array is computed JVM-side (functions.text.tokens — regex
stays in codegen); Python only re-slices it, and the eval node is
Arrow-batched (``useArrow=True`` → ArrowEvalPythonUDTF, not the
row-at-a-time BatchEvalPython the plan-invariant sweep forbids).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(
    returnType="chunk_id bigint, n_chunk_tokens bigint, chunk_text string",
    useArrow=True,
)
class SlidingChunksUDTF:
    """Overlapping token windows: one (chunk_id, size, text) row per
    stride offset; zero-token and NULL token lists fan out to nothing
    (mirrors the oracle's empty range)."""

    def eval(self, toks, width: int, stride: int):
        if not toks:
            return
        for off in range(0, len(toks), stride):
            chunk = toks[off : off + width]
            yield off // stride, len(chunk), " ".join(chunk)


def register_udtfs(spark) -> None:
    """Idempotent SQL registration for LATERAL use."""
    spark.udtf.register("sliding_chunks_udtf", SlidingChunksUDTF)
