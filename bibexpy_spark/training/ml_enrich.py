"""ML enrichment: train-then-apply text classification (Spark ML).

Reference parity (packages/bibex_core/modules/ml_utils.py:104-331): the
reference trains scikit-learn TF-IDF + RandomForest multilabel models on
labeled records and applies them to fill missing categorical fields (e.g.
subject categories).  Spark-first restatement: `pyspark.ml` pipeline
(RegexTokenizer -> HashingTF -> IDF -> LogisticRegression), trained on the
rows that HAVE the label, applied to the rows that don't — the fill-missing
enrichment pattern, executed distributed on both sides (fit uses Spark ML's
own distributed aggregation; transform is a pure map).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF, IDF, RegexTokenizer, StringIndexer, IndexToString
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_text_classifier(
    text_col: str = "text", label_col: str = "label", num_features: int = 4096
) -> Pipeline:
    tokenizer = RegexTokenizer(
        inputCol=text_col, outputCol="_toks", pattern="[^a-zA-Z0-9]+"
    )
    tf = HashingTF(inputCol="_toks", outputCol="_tf", numFeatures=num_features)
    idf = IDF(inputCol="_tf", outputCol="_features")
    # "keep": unseen/null labels get an extra index at TRANSFORM time instead
    # of dropping the very rows the enrichment is meant to fill
    indexer = StringIndexer(
        inputCol=label_col, outputCol="_label_idx", handleInvalid="keep"
    )
    lr = LogisticRegression(
        featuresCol="_features", labelCol="_label_idx", maxIter=20, regParam=0.01
    )
    return Pipeline(stages=[tokenizer, tf, idf, indexer, lr])


def fill_missing_labels(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
) -> tuple[DataFrame, PipelineModel]:
    """Train on labeled rows, predict the label for unlabeled rows.

    Returns (filled, model): ``filled`` has (id, label, label_source) where
    label_source is 'original' or 'predicted'.
    """
    s = F.col(label_col).cast("string")
    labeled = df.filter(s.isNotNull() & (F.trim(s) != ""))
    unlabeled = df.filter(~(s.isNotNull() & (F.trim(s) != "")))

    model = build_text_classifier(text_col, label_col).fit(labeled)
    indexer_model = model.stages[3]
    decode = IndexToString(
        inputCol="prediction", outputCol="_pred_label", labels=indexer_model.labels
    )
    preds = decode.transform(model.transform(unlabeled))

    filled = labeled.select(
        F.col(id_col), s.alias("label_out"), F.lit("original").alias("label_source")
    ).unionByName(
        preds.select(
            F.col(id_col),
            F.col("_pred_label").alias("label_out"),
            F.lit("predicted").alias("label_source"),
        )
    )
    return filled, model
