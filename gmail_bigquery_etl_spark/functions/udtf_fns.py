"""Python UDTF surface (SURVEY.md §2.9): the reference exposes no
user-extensible functions; this engine exposes Spark's native surface, and
the table-function rung of it is demonstrated here with a real UDTF --
sentence segmentation with character offsets, a one-row-to-many expansion
whose per-row state (running offset across emitted sentences) makes it a
genuine table function rather than a transform()-able HOF.

UDFs are the slow path (SURVEY §2.9): everything hot in this repo is
built-ins/HOFs, and this module exists to prove the extension API, not to
carry a hot loop. The splitter is pure Python over each row's text;
Arrow-batched evaluation applies per-partition.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_SENT_RE = re.compile(r"[^.!?]+[.!?]?")


@udtf(returnType="sentence: string, start: int, n_tokens: int")
class SentenceSplit:
    """Emit one row per sentence of ``text``: the trimmed sentence, its
    character offset in the original string, and its whitespace token
    count. Sentences end at . ! ? (terminator kept); a trailing fragment
    without a terminator is still emitted. NULL/empty text emits nothing
    (errors-as-absence, matching the engine's T5 guard convention)."""

    def eval(self, text: str):  # noqa: D102 (contract in class docstring)
        if not text:
            return
        for m in _SENT_RE.finditer(text):
            raw = m.group(0)
            s = raw.strip()
            if not s:
                continue
            yield s, m.start() + (len(raw) - len(raw.lstrip())), len(s.split())


def register_udtfs(spark) -> None:
    """Register the module's UDTFs for SQL use (LATERAL joins)."""
    spark.udtf.register("sentence_split", SentenceSplit)
