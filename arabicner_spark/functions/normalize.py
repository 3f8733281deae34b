"""Arabic surface-form normalization — one definition, two renderings.

``normalize_py`` (plain Python, used inside pandas UDFs and the serial
oracle) and ``normalize_col`` (a JVM-side Column expression built from
``translate`` + ``lower``) MUST stay character-for-character identical:
entity linking joins normalized mention text against normalized aliases,
so any divergence silently breaks linking parity.

Folding rules (standard Arabic IR normalization):
  - alef variants (hamza above/below, madda, wasla) -> bare alef
  - alef maqsura -> yaa, hamza-on-yaa -> yaa, hamza-on-waw -> waw
  - taa marbuta -> haa
  - strip tashkeel (8 diacritics), dagger alef, tatweel
  - ASCII lowercase (Arabic has no case; Latin-script tool names do)

The reference performs no normalization (it feeds raw surface forms to
BERT, /root/reference/arabiner/data/transforms.py:23-52); normalization
here belongs to the entity-linking stage the north rule adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# fold sources -> targets (same index)
_FOLD_SRC = "أإآٱىئؤة"
_FOLD_DST = "ااااييوه"
# deleted outright: fathatan dammatan kasratan fatha damma kasra shadda
# sukun, dagger alef, tatweel
_DELETE = (
    "ًٌٍَُِّْٰـ"
)

_PY_TABLE = str.maketrans(
    {**{s: d for s, d in zip(_FOLD_SRC, _FOLD_DST)}, **{c: None for c in _DELETE}}
)


def normalize_py(text: str) -> str:
    """Normalize one string (Python rendering)."""
    return text.translate(_PY_TABLE).lower()


def normalize_col(col: Column) -> Column:
    """Normalize a string Column (JVM rendering; whole-stage-codegen'd).

    Spark's ``translate`` deletes source characters that have no
    counterpart in the replacement string, which implements the strip
    rules without a regex.
    """
    return F.lower(F.translate(col, _FOLD_SRC + _DELETE, _FOLD_DST))
