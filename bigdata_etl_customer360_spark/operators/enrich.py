"""Distributed classification enrichment (SURVEY §2.10 X1).

The reference's one genuinely custom operator: collect ≤10k rows to the
driver, batch 300 keywords per prompt into an LLM, parse the JSON reply,
default failures to "Other", map labels back
(ETL_customer_behavior.py:27-136). That design has a scalability cliff —
serial driver-side HTTPS calls and a silent ``limit(10000)`` truncation.

Here the operator is Spark-native:
- the expensive call runs once per DISTINCT key (Spark-side dedup),
- batching happens inside ``mapInPandas`` on executors (Arrow transfer,
  no driver collect, no row cap),
- the classifier backend is pluggable: a deterministic rule backend for
  CI/oracle runs, an LLM-style backend (injected transport, batch + JSON
  parse + retry + "Other" fallback) for production,
- labels join back via broadcast (the distinct-key table is tiny relative
  to the fact table).
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable, Iterator, Mapping, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


class RuleClassifier:
    """Deterministic first-match keyword classifier.

    ``rules`` is an ordered mapping label -> substring keywords; a key is
    assigned the FIRST label (in rules order) for which any keyword is a
    substring (case-insensitive), else ``fallback``. The same semantics are
    SQL-expressible (CASE WHEN k LIKE '%kw%' ...), which is what makes the
    operator oracle-checkable.
    """

    def __init__(self, rules: Mapping[str, Sequence[str]], fallback: str = "Other"):
        self.rules = {label: tuple(kws) for label, kws in rules.items()}
        self.fallback = fallback

    def classify_batch(self, keys: pd.Series) -> pd.Series:
        lowered = keys.fillna("").str.lower()
        out = pd.Series(self.fallback, index=keys.index, dtype="object")
        undecided = pd.Series(True, index=keys.index)
        for label, kws in self.rules.items():
            hit = pd.Series(False, index=keys.index)
            for kw in kws:
                hit |= lowered.str.contains(kw.lower(), regex=False)
            take = undecided & hit
            out[take] = label
            undecided &= ~hit
        return out

    def to_case_sql(self, col: str) -> str:
        """The equivalent ANSI-SQL CASE expression (for oracles/pushdown).

        Keywords are treated as literal substrings, exactly like
        ``classify_batch``'s ``str.contains(regex=False)``: single quotes
        are doubled and LIKE metacharacters (%/_) are escaped with ``!``
        (chosen over backslash, which Spark string literals consume but
        ANSI/DuckDB literals don't — ``!`` parses identically everywhere).
        """

        def lit(s: str) -> str:
            return s.replace("'", "''")

        def like_pat(kw: str) -> str:
            pat = (
                kw.lower().replace("!", "!!").replace("%", "!%").replace("_", "!_")
            )
            return lit(pat)

        branches = []
        for label, kws in self.rules.items():
            cond = " OR ".join(
                f"lower({col}) LIKE '%{like_pat(kw)}%' ESCAPE '!'" for kw in kws
            )
            branches.append(f"WHEN {cond} THEN '{lit(label)}'")
        return "CASE " + " ".join(branches) + f" ELSE '{lit(self.fallback)}' END"


class BatchPromptClassifier:
    """LLM-style backend preserving the reference's protocol semantics
    (ETL_customer_behavior.py:47-132): batch N keys per prompt, call an
    injected transport, extract the first ``{...}`` JSON object, retry
    once, and fall back to ``fallback`` for missing/failed keys.

    ``transport`` is any ``Callable[[str], str]`` (an LLM client, an HTTP
    call, or a test fake) — credentials/config live with the caller, never
    in this library (the reference hardcodes an API key;
    ETL_customer_behavior.py:28).
    """

    def __init__(
        self,
        transport: Callable[[str], str],
        labels: Sequence[str],
        batch_size: int = 300,
        fallback: str = "Other",
        retries: int = 1,
        prompt_template: str = (
            "Classify each item into exactly one of {labels}. "
            'Reply with one JSON object mapping item to label.\nItems: {items}'
        ),
    ):
        self.transport = transport
        self.labels = list(labels)
        self.batch_size = batch_size
        self.fallback = fallback
        self.retries = retries
        self.prompt_template = prompt_template

    _JSON_RE = re.compile(r"\{.*\}", re.DOTALL)

    def _classify_chunk(self, keys: list[str]) -> dict[str, str]:
        prompt = self.prompt_template.format(labels=self.labels, items=json.dumps(keys))
        for _ in range(self.retries + 1):
            try:
                reply = self.transport(prompt)
                m = self._JSON_RE.search(reply)
                if not m:
                    continue
                parsed = json.loads(m.group(0))
                return {
                    k: (v if v in self.labels else self.fallback)
                    for k, v in parsed.items()
                    if isinstance(k, str)
                }
            except Exception:
                continue
        return {}

    def classify_batch(self, keys: pd.Series) -> pd.Series:
        mapping: dict[str, str] = {}
        uniq = [k for k in keys.dropna().unique().tolist()]
        for i in range(0, len(uniq), self.batch_size):
            mapping.update(self._classify_chunk(uniq[i : i + self.batch_size]))
        return keys.map(lambda k: mapping.get(k, self.fallback))


def gemini_transport(
    model: str = "gemini-2.0-flash",
    api_key: str | None = None,
    api_key_env: str = "GEMINI_API_KEY",
    endpoint: str = (
        "https://generativelanguage.googleapis.com/v1beta/models/"
        "{model}:generateContent"
    ),
    timeout: float = 30.0,
    opener: Callable[..., object] | None = None,
) -> Callable[[str], str]:
    """Concrete ``transport`` for :class:`BatchPromptClassifier` speaking
    the public Gemini ``generateContent`` REST protocol — the provider the
    reference actually calls (ETL_customer_behavior.py:27-28,116), with
    the credential moved OUT of source: the key comes from ``api_key`` or
    ``$GEMINI_API_KEY``, and construction fails fast when neither is set.

    Stdlib-only (urllib) so the library adds no dependency; ``opener`` is
    an injectable ``urlopen``-compatible callable — tests exercise the
    full request build + response parse offline, and a custom opener is
    also the hook for proxies/recording. Errors propagate to
    ``BatchPromptClassifier``, whose retry + "Other" fallback is the
    policy layer (this function is transport only).

    Executor note: the returned closure is pickled into ``mapInPandas``
    workers by ``classify_column`` — each executor makes its own HTTPS
    calls (parallel by partition), which replaces the reference's serial
    driver-side loop.
    """
    import os
    import urllib.request

    key = api_key if api_key is not None else os.environ.get(api_key_env, "")
    if not key:
        raise ValueError(
            f"no API key: pass api_key or set ${api_key_env} "
            "(never hardcode credentials in source)"
        )
    url = endpoint.format(model=model)
    do_open = opener if opener is not None else urllib.request.urlopen

    def transport(prompt: str) -> str:
        body = json.dumps(
            {"contents": [{"parts": [{"text": prompt}]}]}
        ).encode("utf-8")
        req = urllib.request.Request(
            url,
            data=body,
            headers={
                "Content-Type": "application/json",
                "x-goog-api-key": key,
            },
            method="POST",
        )
        with do_open(req, timeout=timeout) as resp:  # type: ignore[operator]
            payload = json.loads(resp.read().decode("utf-8"))
        return payload["candidates"][0]["content"]["parts"][0]["text"]

    return transport


def classify_column(
    df: DataFrame,
    col: str,
    classifier,
    out_col: str = "category",
    chunk_size: int = 1000,
    broadcast_labels: bool = True,
) -> DataFrame:
    """Attach ``out_col`` = classifier(label) for ``col``.

    Plan shape: distinct(col) → mapInPandas(classify) → broadcast join
    back. The expensive classify runs once per distinct key on executors;
    the fact table is never collected and never leaves the JVM. At 100 TB
    the distinct-key table (keywords, categories, domains) is typically
    millions of rows — still broadcastable; set ``broadcast_labels=False``
    to fall back to a shuffle join when it isn't.
    """
    schema = StructType(
        [StructField(col, StringType()), StructField(out_col, StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for i in range(0, len(pdf), chunk_size):
                chunk = pdf[col].iloc[i : i + chunk_size]
                yield pd.DataFrame({col: chunk, out_col: classifier.classify_batch(chunk)})

    keys = df.select(col).where(F.col(col).isNotNull()).distinct()
    labels = keys.mapInPandas(run, schema=schema)
    if broadcast_labels:
        labels = F.broadcast(labels)
    joined = df.join(labels, on=col, how="left")
    # null keys / unclassified keys take the fallback, mirroring the
    # reference's "Other" default (ETL_customer_behavior.py:125,131).
    fallback = getattr(classifier, "fallback", "Other")
    return joined.withColumn(out_col, F.coalesce(F.col(out_col), F.lit(fallback)))
