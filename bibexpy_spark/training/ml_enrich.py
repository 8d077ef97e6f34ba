"""ML enrichment: train-then-apply text classification (Spark ML).

Reference parity (packages/bibex_core/modules/ml_utils.py:104-331): the
reference trains scikit-learn TF-IDF + RandomForest multilabel models on
labeled records and applies them to fill missing categorical fields (e.g.
subject categories).  Spark-first restatement: `pyspark.ml` pipeline
(RegexTokenizer -> HashingTF -> IDF -> LogisticRegression), trained on the
rows that HAVE the label, applied to the rows that don't — the fill-missing
enrichment pattern, executed distributed on both sides (fit uses Spark ML's
own distributed aggregation; transform is a pure map).

Two variants:

* :func:`fill_missing_labels` — single-label (multiclass argmax), the r2
  baseline;
* :func:`fill_missing_multilabel` — the reference's ACTUAL semantics
  (ml_utils.py:125-186: MultiLabelBinarizer over ';'-split values,
  MultiOutputClassifier = one independent binary classifier per label,
  per-label probability threshold 0.3, output '; '-joined, None when no
  label clears the threshold).  Spark-first: the TF-IDF featurizer fits
  ONCE; one binary LR per vocabulary label (base classifier substitution
  RF->LR documented in SURVEY §2); all per-label scorers chain into a
  single distributed transform pass — no per-label job fan-out at apply
  time, no joins.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF, IDF, RegexTokenizer, StringIndexer, IndexToString
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _strip_training_summary(model) -> None:
    """Drop a fitted model's training summary before using its transform.

    Spark ML keeps the training summary in a non-transient model field, and
    the summary holds the fitting SparkSession; the prediction UDF closure
    captures the model, so the session rides along into task serialization.
    That is normally survivable (the session's heavy fields are transient)
    — until anything initializes the session's lazy, NON-serializable
    ``observationManager``, which any ``Dataset.observe`` does.  This
    engine's connected-components loop observes its convergence checksum
    (components.py), so a pipeline that clusters and then applies an ML
    model in one session dies with ``java.io.NotSerializableException:
    ObservationManager`` at the first model-backed collect.  The summary is
    training-time metadata this module never reads; stripping it removes
    the session from the closure graph.  Best-effort: model types without
    the field are left untouched.
    """
    try:
        jm = model._java_obj
        from pyspark import SparkContext

        none = SparkContext._active_spark_context._jvm.scala.Option.empty()
        jm.setSummary(none)
    except Exception:
        pass


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
    _strip_training_summary(model.stages[4])
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


def fill_missing_multilabel(
    df: DataFrame,
    text_col: str = "text",
    labels_col: str = "labels",
    id_col: str = "doc_id",
    threshold: float = 0.3,
    num_features: int = 4096,
    max_labels: int = 200,
) -> tuple[DataFrame, list[str]]:
    """Reference-parity multilabel fill (ml_utils.py:125-186): ``labels_col``
    holds ';'-separated label sets; train one-vs-rest binary classifiers
    over the label vocabulary on the labeled rows, then fill unlabeled rows
    with every label whose probability >= ``threshold`` ('; '-joined, null
    when none clears it — exactly predict_subjects' contract).

    Returns (filled, vocabulary); ``filled`` has (id, label_out,
    label_source='original'|'predicted').

    Scale notes: the label vocabulary is collected to the driver (bounded:
    subject-category scale is tens-to-hundreds; a corpus whose vocabulary
    exceeds ``max_labels`` raises rather than silently fanning out thousands
    of fits).  Fitting runs one distributed LR job per label; APPLY is one
    pass — the k scorers chain into a single transform plan.
    """
    s = F.col(labels_col).cast("string")
    lab_arr = F.array_distinct(
        F.filter(
            F.transform(F.split(s, ";"), lambda x: F.trim(x)),
            lambda x: x != "",
        )
    )
    labeled = df.filter(s.isNotNull() & (F.trim(s) != "")).withColumn(
        "_labs", lab_arr
    )
    unlabeled = df.filter(~(s.isNotNull() & (F.trim(s) != "")))

    tokenizer = RegexTokenizer(
        inputCol=text_col, outputCol="_toks", pattern="[^a-zA-Z0-9]+"
    )
    tf = HashingTF(inputCol="_toks", outputCol="_tf", numFeatures=num_features)
    idf = IDF(inputCol="_tf", outputCol="_features")
    featurizer = Pipeline(stages=[tokenizer, tf, idf]).fit(labeled)
    train_feat = featurizer.transform(labeled).persist()

    vocab = sorted(
        r["_lab"]
        for r in train_feat.select(
            F.explode("_labs").alias("_lab")
        ).distinct().collect()
    )
    if len(vocab) > max_labels:
        raise ValueError(
            f"label vocabulary has {len(vocab)} entries (> max_labels="
            f"{max_labels}); refusing to fit one binary model per label — "
            "raise max_labels explicitly if this is intended"
        )

    models = []
    for i, lab in enumerate(vocab):
        lr = LogisticRegression(
            featuresCol="_features",
            labelCol="_y",
            probabilityCol=f"_prob_{i}",
            rawPredictionCol=f"_raw_{i}",
            predictionCol=f"_predcol_{i}",
            maxIter=25,
            regParam=0.01,
        )
        train_i = train_feat.withColumn(
            "_y", F.array_contains("_labs", lab).cast("double")
        )
        m = lr.fit(train_i)
        _strip_training_summary(m)
        models.append(m)
    train_feat.unpersist()

    scored = featurizer.transform(unlabeled)
    for m in models:
        scored = m.transform(scored)
    member = [
        F.when(
            F.element_at(vector_to_array(f"_prob_{i}"), 2) >= F.lit(threshold),
            F.lit(lab),
        )
        for i, lab in enumerate(vocab)
    ]
    pred_join = F.array_join(
        F.filter(F.array(*member), lambda x: x.isNotNull()), "; "
    )
    preds = scored.withColumn(
        "_pred_labels", F.when(pred_join != "", pred_join)
    )

    filled = labeled.select(
        F.col(id_col), s.alias("label_out"), F.lit("original").alias("label_source")
    ).unionByName(
        preds.select(
            F.col(id_col),
            F.col("_pred_labels").alias("label_out"),
            F.lit("predicted").alias("label_source"),
        )
    )
    return filled, vocab
