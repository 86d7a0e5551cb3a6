"""ML pipelines: node classification, node regression, link prediction.

Reference: pipeline/ (NodePropertyTrainingPipeline.java,
LinkPredictionTrainingPipeline.java) and ml/ -- GDS pipelines are
  1. node-property steps (run graph algorithms, mutate properties),
  2. feature selection / link-feature steps (hadamard, l2, cosine),
  3. a train step with a holdout split and model-candidate selection,
  4. a predict surface.

Spark-first mapping: node-property steps are plain operator calls whose
outputs join into one feature DataFrame; feature assembly is
`array<double>` columns concatenated JVM-side; training delegates to
spark.ml estimators (LogisticRegression / RandomForest* / MLP via the
``method`` arg, mirroring ClassifierTrainerFactory.java:79; LinearRegression
/ RandomForestRegressor for regression), which are themselves distributed
-- no driver-side learning loops. Link features are Catalyst expressions over the two
endpoint arrays (zip_with products / differences), so candidate scoring
never leaves the JVM.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .catalog import DST, SRC, SparkGraph, register_cache

_FEAT = "features_vec"


def _assemble(df: DataFrame, feature_cols: list[str]) -> DataFrame:
    """Concatenate scalar/array feature columns into one ml Vector column.
    Arrays are spread; scalars cast to double."""
    from pyspark.ml.functions import array_to_vector

    parts = []
    for c in feature_cols:
        dt = dict(df.dtypes)[c]
        if dt.startswith("array"):
            parts.append(F.col(c).cast("array<double>"))
        else:
            parts.append(F.array(F.col(c).cast("double")))
    return df.withColumn(
        _FEAT, array_to_vector(F.flatten(F.array(*parts)))
    )


@dataclass
class _BasePipeline:
    """Shared node-property-step plumbing (pipeline/NodePropertyStep.java)."""

    steps: list[tuple[str, Callable[[SparkGraph], DataFrame]]] = field(
        default_factory=list
    )
    feature_cols: list[str] = field(default_factory=list)

    def add_node_property(
        self, name: str, fn: Callable[[SparkGraph], DataFrame]
    ) -> "_BasePipeline":
        """fn(graph) must return (id, <value>) with exactly one value
        column; it is renamed to `name` and joined into the feature table."""
        self.steps.append((name, fn))
        return self

    def select_features(self, cols: list[str]) -> "_BasePipeline":
        self.feature_cols = list(cols)
        return self

    def _node_features(self, graph: SparkGraph) -> DataFrame:
        out = graph.nodes
        for name, fn in self.steps:
            res = fn(graph)
            val = [c for c in res.columns if c != "id"][0]
            out = out.join(
                res.select("id", F.col(val).alias(name)), "id", "left"
            )
        for name, _ in self.steps:
            dt = dict(out.dtypes)[name]
            if not dt.startswith("array"):
                out = out.fillna(0.0, [name])
        # persisted: the feature frame is referenced several times
        # downstream (train + both endpoint joins of every pair-feature
        # build) and each node-property step above is a full algorithm
        # run -- without the cache those algorithms re-execute per
        # reference
        return register_cache(out.persist())


def _make_classifier(method: str, seed: int, data: DataFrame,
                     mlp_hidden_layers: tuple[int, ...] = (16,)):
    """The ClassifierTrainerFactory dispatch (ml/ml-algo/.../models/
    ClassifierTrainerFactory.java:79): LogisticRegression / RandomForest /
    MLPClassifier, mapped onto the distributed spark.ml estimators."""
    from pyspark.ml.classification import (
        LogisticRegression, MultilayerPerceptronClassifier,
        RandomForestClassifier,
    )

    if method == "logistic_regression":
        return LogisticRegression(featuresCol=_FEAT, labelCol="label",
                                  maxIter=50)
    if method == "random_forest":
        return RandomForestClassifier(featuresCol=_FEAT, labelCol="label",
                                      seed=seed)
    if method == "mlp":
        # spark.ml's MLP wants the full layer spec: probe input width from
        # one row, class count from the labels (0..k-1 contiguous required)
        first = data.select(_FEAT, "label").first()
        n_features = len(first[_FEAT])
        n_classes = int(data.agg(F.max("label")).collect()[0][0]) + 1
        return MultilayerPerceptronClassifier(
            featuresCol=_FEAT, labelCol="label", seed=seed,
            layers=[n_features, *mlp_hidden_layers, max(n_classes, 2)],
            maxIter=100,
        )
    raise ValueError(
        f"unknown method {method!r}: expected logistic_regression, "
        "random_forest, or mlp")


class NodeClassificationPipeline(_BasePipeline):
    """gds.beta.pipeline.nodeClassification.* analogue."""

    def train(self, graph: SparkGraph, labels: DataFrame,
              label_col: str = "label", holdout: float = 0.25,
              seed: int = 42, method: str = "logistic_regression",
              mlp_hidden_layers: tuple[int, ...] = (16,)):
        """labels: (id, label). Returns (model, metrics dict).

        ``method`` selects the model candidate the way the reference's
        trainer factory does (ClassifierTrainerFactory.java:79):
        logistic_regression | random_forest | mlp (MLPClassifier ->
        spark.ml MultilayerPerceptronClassifier; labels must be 0..k-1)."""
        from pyspark.ml.evaluation import (
            MulticlassClassificationEvaluator,
        )

        feats = self._node_features(graph)
        data = _assemble(
            feats.join(labels.select("id", F.col(label_col).alias("label")),
                       "id"),
            self.feature_cols or [n for n, _ in self.steps],
        ).select("id", _FEAT, F.col("label").cast("double"))
        train_df, test_df = data.randomSplit(
            [1.0 - holdout, holdout], seed=seed
        )
        model = _make_classifier(method, seed, data,
                                 mlp_hidden_layers).fit(train_df)
        pred = model.transform(test_df)
        ev = MulticlassClassificationEvaluator(
            labelCol="label", predictionCol="prediction"
        )
        metrics = {
            "accuracy": ev.evaluate(pred, {ev.metricName: "accuracy"}),
            "f1": ev.evaluate(pred, {ev.metricName: "f1"}),
        }
        return model, metrics

    def predict(self, graph: SparkGraph, model) -> DataFrame:
        feats = _assemble(
            self._node_features(graph),
            self.feature_cols or [n for n, _ in self.steps],
        )
        return model.transform(feats).select(
            "id", F.col("prediction").cast("long").alias("predicted_class")
        )


class NodeRegressionPipeline(_BasePipeline):
    """gds.alpha.pipeline.nodeRegression.* analogue."""

    def train(self, graph: SparkGraph, targets: DataFrame,
              target_col: str = "target", holdout: float = 0.25,
              seed: int = 42, method: str = "linear_regression"):
        """``method``: linear_regression | random_forest (the reference's
        RegressorTrainerFactory candidates)."""
        from pyspark.ml.evaluation import RegressionEvaluator
        from pyspark.ml.regression import (
            LinearRegression, RandomForestRegressor,
        )

        feats = self._node_features(graph)
        data = _assemble(
            feats.join(
                targets.select("id", F.col(target_col).alias("target")), "id"
            ),
            self.feature_cols or [n for n, _ in self.steps],
        ).select("id", _FEAT, F.col("target").cast("double"))
        train_df, test_df = data.randomSplit(
            [1.0 - holdout, holdout], seed=seed
        )
        if method == "linear_regression":
            est = LinearRegression(featuresCol=_FEAT, labelCol="target",
                                   maxIter=50)
        elif method == "random_forest":
            est = RandomForestRegressor(featuresCol=_FEAT,
                                        labelCol="target", seed=seed)
        else:
            raise ValueError(
                f"unknown method {method!r}: expected linear_regression "
                "or random_forest")
        model = est.fit(train_df)
        pred = model.transform(test_df)
        ev = RegressionEvaluator(labelCol="target",
                                 predictionCol="prediction")
        metrics = {
            "rmse": ev.evaluate(pred, {ev.metricName: "rmse"}),
            "r2": ev.evaluate(pred, {ev.metricName: "r2"}),
        }
        return model, metrics

    def predict(self, graph: SparkGraph, model) -> DataFrame:
        feats = _assemble(
            self._node_features(graph),
            self.feature_cols or [n for n, _ in self.steps],
        )
        return model.transform(feats).select(
            "id", F.col("prediction").alias("predicted_value")
        )


class LinkPredictionPipeline(_BasePipeline):
    """gds.beta.pipeline.linkPrediction.* analogue.

    Link features combine the two endpoints' node-feature arrays
    (pipeline/linkPipeline/linkfunctions/): hadamard (elementwise product),
    l2 (squared difference), cosine (scalar).
    """

    def __init__(self) -> None:
        super().__init__()
        self.link_feature: str = "hadamard"

    def add_link_feature(self, kind: str) -> "LinkPredictionPipeline":
        if kind not in ("hadamard", "l2", "cosine"):
            raise ValueError(kind)
        self.link_feature = kind
        return self

    def _pair_features(self, feats: DataFrame, pairs: DataFrame) -> DataFrame:
        cols = self.feature_cols or [n for n, _ in self.steps]
        arr = feats.select(
            "id",
            F.flatten(F.array(*[
                F.col(c).cast("array<double>")
                if dict(feats.dtypes)[c].startswith("array")
                else F.array(F.col(c).cast("double"))
                for c in cols
            ])).alias("_fv"),
        )
        j = (
            pairs.join(arr.select(F.col("id").alias(SRC),
                                  F.col("_fv").alias("_fa")), SRC)
            .join(arr.select(F.col("id").alias(DST),
                             F.col("_fv").alias("_fb")), DST)
        )
        if self.link_feature == "hadamard":
            lf = F.zip_with("_fa", "_fb", lambda a, b: a * b)
        elif self.link_feature == "l2":
            lf = F.zip_with("_fa", "_fb", lambda a, b: (a - b) * (a - b))
        else:  # cosine -> single-element array
            from .functions.vector import cosine

            lf = F.array(F.coalesce(cosine(F.col("_fa"), F.col("_fb")),
                                    F.lit(0.0)))
        from pyspark.ml.functions import array_to_vector

        return j.withColumn(_FEAT, array_to_vector(lf)).drop("_fa", "_fb")

    def train(self, graph: SparkGraph, holdout: float = 0.25,
              negative_ratio: float = 1.0, seed: int = 42,
              method: str = "logistic_regression",
              mlp_hidden_layers: tuple[int, ...] = (16,)):
        """Positive = existing (distinct, non-loop) edges; negative =
        hash-sampled node pairs that are not edges (reference
        linkPipeline/train/ split semantics, simplified to one candidate
        model). ``method``: logistic_regression | random_forest | mlp.
        Returns (model, metrics with auc)."""
        from pyspark.ml.evaluation import BinaryClassificationEvaluator

        feats = self._node_features(graph)
        edges = (
            graph.oriented_edges("UNDIRECTED").select(SRC, DST).distinct()
            .filter(F.col(SRC) < F.col(DST))
        )
        n_pos = edges.count()
        n_neg = int(n_pos * negative_ratio) or 1
        ids = graph.nodes.select("id")
        # deterministic candidate pairs: hash-ranked self-join sample
        left = ids.select(F.col("id").alias(SRC))
        right = ids.select(F.col("id").alias(DST))
        cand = (
            left.crossJoin(right)
            .filter(F.col(SRC) < F.col(DST))
            .withColumn("_h", F.xxhash64(SRC, DST, F.lit(seed)))
            .orderBy("_h")
            .limit(n_neg * 3)
            .join(edges, [SRC, DST], "left_anti")
            .limit(n_neg)
            .drop("_h")
        )
        pos = self._pair_features(feats, edges).withColumn(
            "label", F.lit(1.0)
        )
        neg = self._pair_features(feats, cand).withColumn(
            "label", F.lit(0.0)
        )
        data = pos.select(SRC, DST, _FEAT, "label").unionByName(
            neg.select(SRC, DST, _FEAT, "label")
        )
        train_df, test_df = data.randomSplit(
            [1.0 - holdout, holdout], seed=seed
        )
        model = _make_classifier(method, seed, data,
                                 mlp_hidden_layers).fit(train_df)
        ev = BinaryClassificationEvaluator(
            labelCol="label", rawPredictionCol="rawPrediction"
        )
        test_used = test_df if not test_df.isEmpty() else train_df
        metrics = {"auc": ev.evaluate(model.transform(test_used))}
        return model, metrics

    def predict(self, graph: SparkGraph, model,
                pairs: DataFrame | None = None,
                top_n: int | None = None) -> DataFrame:
        """(src, dst, probability) for candidate pairs (default: all
        non-edge pairs -- callers should pass bounded candidates at scale,
        e.g. KNN buckets)."""
        from pyspark.ml.functions import vector_to_array

        feats = self._node_features(graph)
        if pairs is None:
            ids = graph.nodes.select("id")
            edges = (
                graph.oriented_edges("UNDIRECTED").select(SRC, DST)
                .distinct().filter(F.col(SRC) < F.col(DST))
            )
            pairs = (
                ids.select(F.col("id").alias(SRC))
                .crossJoin(ids.select(F.col("id").alias(DST)))
                .filter(F.col(SRC) < F.col(DST))
                .join(edges, [SRC, DST], "left_anti")
            )
        scored = model.transform(self._pair_features(feats, pairs)).select(
            SRC, DST,
            vector_to_array(F.col("probability")).getItem(1)
            .alias("probability"),
        )
        if top_n is not None:
            scored = scored.orderBy(
                F.col("probability").desc(), SRC, DST
            ).limit(top_n)
        return scored


class ModelCatalog:
    """Named trained-model registry -- gds.model.list / .exists / .drop
    (model-catalog-services ModelCatalog; proc ModelListProc etc.).

    Stores whatever the pipelines' train steps return (spark.ml models);
    metadata rides alongside for the `list` surface."""

    def __init__(self) -> None:
        self._models: dict[str, tuple[object, dict]] = {}

    def store(self, name: str, model: object, **metadata) -> None:
        self._models[name] = (model, dict(metadata))

    def get(self, name: str) -> object:
        return self._models[name][0]

    def exists(self, name: str) -> bool:
        return name in self._models

    def drop(self, name: str) -> None:
        self._models.pop(name, None)

    def list(self) -> list[dict]:
        return [
            {"modelName": n, **meta}
            for n, (_, meta) in sorted(self._models.items())
        ]
