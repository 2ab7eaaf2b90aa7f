"""Property-based differential testing (SURVEY.md §5 item 2): for ANY
text, engine output ≡ collections.Counter(re.findall(r'[A-Za-z0-9]+',
text)) — the oracle verified byte-exact against the reference binary.

Hypothesis drives adversarial inputs: mixed scripts, long separator
runs, digit/letter boundaries, empty strings. One Spark job per
example is slow, so examples are batched: each hypothesis case
contributes rows to one DataFrame and the comparison runs per-row
tagged by case id.
"""

from __future__ import annotations

import collections
import re

from hypothesis import given, settings, strategies as st

from mapreducewordoccurences_spark.core.wordcount import tokenize

ORACLE_RE = re.compile(r"[A-Za-z0-9]+")

text_strategy = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("Lu", "Ll", "Nd", "Po", "Zs", "Cc", "So"),
    ),
    max_size=200,
)


@settings(max_examples=30, deadline=None)
@given(st.lists(text_strategy, min_size=1, max_size=20))
def test_tokenizer_matches_reference_oracle(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["case_id", "text"])
    toks = df.select("case_id", "text").selectExpr(
        "case_id", "explode(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) AS word"
    )
    got: dict[int, collections.Counter] = collections.defaultdict(collections.Counter)
    for r in toks.collect():
        got[r["case_id"]][r["word"]] += 1
    for i, t in enumerate(texts):
        expected = collections.Counter(ORACLE_RE.findall(t))
        assert got.get(i, collections.Counter()) == expected, (i, t)


@settings(max_examples=15, deadline=None)
@given(text_strategy)
def test_tokenize_df_api(spark, text):
    df = spark.createDataFrame([(text,)], ["text"])
    words = [r["word"] for r in tokenize(df).collect()]
    assert sorted(words) == sorted(ORACLE_RE.findall(text))
