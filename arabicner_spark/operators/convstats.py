"""Whole-conversation grouped-map features — the plain-``applyInPandas``
Arrow shape (groupBy(conv_id).applyInPandas), completing the UDF
surface next to mapInPandas (NER) and applyInPandasWithState
(streaming counters).  SURVEY.md §2.B names this as the one grouped-map
case the pipeline may need: per-conversation features that are
ORDER-SENSITIVE across turns, which a hash aggregate can't express
without collect_list gymnastics.

Scale posture: one shuffle on conv_id (the pipeline's native
partitioning key, salting available upstream for hot conversations);
each group is one conversation — bounded by the longest conversation,
not by data volume; batch math is pandas/hashlib inside Arrow.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame

PROFILE_SCHEMA = (
    "conv_id string, n_turns int, role_path string, longest_run int, conv_md5 string"
)


def conv_profiles(transcripts: DataFrame) -> DataFrame:
    """-> (conv_id, n_turns, role_path, longest_run, conv_md5).

    role_path: first letter of each turn's role in turn order (the
    conversation's shape signature); longest_run: longest consecutive
    same-role stretch; conv_md5: md5 over the ordered turn texts
    joined with 0x1f (pins full content + order without shipping it).
    """

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx")
        roles = pdf["role"].fillna("?").tolist()
        texts = pdf["text"].fillna("").tolist()
        longest = run = 0
        prev = None
        for r in roles:
            run = run + 1 if r == prev else 1
            prev = r
            longest = max(longest, run)
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "n_turns": [len(pdf)],
                "role_path": ["".join(r[:1] for r in roles)],
                "longest_run": [longest],
                "conv_md5": [
                    hashlib.md5("\x1f".join(texts).encode("utf-8")).hexdigest()
                ],
            }
        )

    return (
        transcripts.select("conv_id", "turn_idx", "role", "text")
        .groupBy("conv_id")
        .applyInPandas(profile, schema=PROFILE_SCHEMA)
    )
