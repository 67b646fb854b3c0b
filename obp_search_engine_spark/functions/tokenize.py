"""The classifier's text pipeline (reference
listingfiltering/learnNetwork.py:183-196 ``process_text``):

  1. remove ASCII punctuation characters,
  2. split on whitespace,
  3. drop English stopwords (case-insensitive test, original case kept).

``process_text`` is the pure oracle; ``process_text_udf`` the Arrow
vectorized version. The stopword list is the standard public English list
the reference pulls from nltk (embedded here — nltk isn't a dependency);
byte-identical behavior is asserted between the pure function and the UDF.
"""

from __future__ import annotations

import string

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the standard English stopword list (as shipped by NLTK; public domain)
ENGLISH_STOPWORDS = frozenset(
    """a about above after again against ain all am an and any are aren aren't
    as at be because been before being below between both but by can couldn
    couldn't d did didn didn't do does doesn doesn't doing don don't down
    during each few for from further had hadn hadn't has hasn hasn't have
    haven haven't having he her here hers herself him himself his how i if in
    into is isn isn't it it's its itself just ll m ma me mightn mightn't more
    most mustn mustn't my myself needn needn't no nor not now o of off on
    once only or other our ours ourselves out over own re s same shan shan't
    she she's should should've shouldn shouldn't so some such t than that
    that'll the their theirs them themselves then there these they this those
    through to too under until up ve very was wasn wasn't we were weren
    weren't what when where which while who whom why will with won won't
    wouldn wouldn't y you you'd you'll you're you've your yours yourself
    yourselves""".split()
)

_PUNCT_TABLE = str.maketrans("", "", string.punctuation)


def process_text(text: str | None) -> list[str]:
    """Pure single-value oracle: punctuation strip -> split -> stopword drop."""
    if text is None:
        return []
    nopunc = text.translate(_PUNCT_TABLE)
    return [w for w in nopunc.split() if w.lower() not in ENGLISH_STOPWORDS]


@F.pandas_udf(T.ArrayType(T.StringType()))
def process_text_udf(texts: pd.Series) -> pd.Series:
    cleaned = texts.fillna("").str.translate(_PUNCT_TABLE).str.split()
    return cleaned.map(
        lambda ws: [w for w in ws if w.lower() not in ENGLISH_STOPWORDS]
    )
