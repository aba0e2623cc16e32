"""Model deployment control plane, Spark-native (SURVEY.md §2.11 tail).

The reference's ``sagemaker/deployment/deployment_orchestrator.py:36-517``
manages endpoint configs, A/B variant traffic weights, autoscaling, and
batch transform jobs. Most of that is AWS control-plane; the parts with
engine meaning re-express directly:

- **model registry** → a lake-backed parquet table of model metadata
  (:class:`ModelRegistry`): append-only versions, latest-per-name view,
  champion/challenger stages — the same append + window-latest pattern as
  the feature store's lineage (``featurestore.py``).
- **batch transform** → distributed ``model.transform`` over a DataFrame
  (:func:`batch_transform`) — Spark IS the batch-transform fleet.
- **A/B traffic split** → deterministic per-mille hash split of the
  scoring population (:func:`ab_split_score`): variant assignment is a
  pure map on the entity key (the same partitioning-independent bucket
  arithmetic as ``operators/sampling.py``), so a re-run, a retry, or a
  different cluster assigns every row the same variant — the property
  endpoint-weight randomization can't give you.
- **promotion** → metric-gated champion/challenger comparison
  (:func:`promote_challenger`) recorded in the registry, replacing the
  orchestrator's endpoint-config swap.
- autoscaling has no engine analog (cluster property) — size executors
  to the scoring volume; the split/score plan is shuffle-free either way.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineeringpipeline_spark.operators.sampling import per_mille_bucket

REGISTRY_SCHEMA = (
    "model_name string, version bigint, stage string, metric_name string, "
    "metric_value double, params string, registered_run string"
)


@dataclass
class ModelRegistry:
    """Append-only model metadata table at ``root`` with a
    latest-version-per-name view — deliberately the same
    append/window-latest shape as the feature store, so registry reads
    scale the same way (one well-spread shuffle on the name key)."""

    root: str

    def _path(self) -> str:
        return os.path.join(self.root, "model_registry")

    def register(
        self,
        spark: SparkSession,
        model_name: str,
        stage: str,
        metric_name: str,
        metric_value: float,
        params: str = "{}",
        run_id: str = "run-0",
    ) -> int:
        """Append the next version row for ``model_name``; returns it.

        Only the missing-table analysis error falls back to version 1 —
        a transient IO/corruption error must propagate, not silently
        reset versioning and append a duplicate version (registration is
        read-increment-append, not atomic; concurrent registrations
        should serialize at the orchestrator)."""
        from pyspark.errors import AnalysisException

        try:
            current = spark.read.parquet(self._path()).filter(
                F.col("model_name") == model_name
            )
            version = (current.agg(F.max("version")).collect()[0][0] or 0) + 1
        except AnalysisException:  # first registration: table doesn't exist yet
            version = 1
        row = [(model_name, version, stage, metric_name, float(metric_value), params, run_id)]
        spark.createDataFrame(row, REGISTRY_SCHEMA).write.mode("append").parquet(self._path())
        return version

    def latest(self, spark: SparkSession) -> DataFrame:
        """One row per model name: the highest version (ties — which only
        arise if an external writer bypassed :meth:`register` — resolve
        deterministically by latest ``registered_run``)."""
        w = Window.partitionBy("model_name").orderBy(
            F.desc("version"), F.desc("registered_run")
        )
        return (
            spark.read.parquet(self._path())
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    def stage_of(self, spark: SparkSession, model_name: str) -> str:
        rows = self.latest(spark).filter(F.col("model_name") == model_name).collect()
        if not rows:
            raise KeyError(f"model {model_name!r} not registered")
        return rows[0]["stage"]


def batch_transform(model, prepared: DataFrame) -> DataFrame:
    """The reference's batch-transform job is just a distributed scoring
    pass here — ``model.transform`` runs model broadcast + map-only
    inference on however many executors hold the data."""
    return model.transform(prepared)


def ab_split_score(
    prepared: DataFrame,
    champion,
    challenger,
    key_col: str,
    challenger_pm: int = 100,
) -> DataFrame:
    """Score the population under an A/B traffic split: rows whose
    deterministic per-mille bucket of ``key_col`` falls under
    ``challenger_pm`` are scored by the challenger, the rest by the
    champion (the orchestrator's variant weights, e.g. 100 ≙ 10%
    challenger traffic).

    The assignment is a pure map on the key — no shuffle, stable under
    repartitioning and re-runs, and the same entity always gets the same
    variant (session-consistent, which randomized endpoint weights are
    not). Each model scores only its own slice; the result is the union
    with a ``variant`` column. Rows with a NULL key cannot hash to a
    bucket and are routed to the champion explicitly (every row is
    scored exactly once; negative keys bucket correctly via the pmod in
    :func:`..operators.sampling.per_mille_bucket`).
    """
    bucket = per_mille_bucket(key_col)
    is_challenger = F.col(key_col).isNotNull() & (bucket < challenger_pm)
    challenger_rows = prepared.filter(is_challenger)
    champion_rows = prepared.filter(F.col(key_col).isNull() | (bucket >= challenger_pm))
    return batch_transform(champion, champion_rows).withColumn(
        "variant", F.lit("champion")
    ).unionByName(
        batch_transform(challenger, challenger_rows).withColumn("variant", F.lit("challenger"))
    )


def ab_variant_metrics(scored: DataFrame, label_col: str = "label") -> DataFrame:
    """Per-variant observed quality from a scored A/B population: row
    count, accuracy, and positive rate in ONE aggregation pass (the
    monitoring table the promotion decision reads)."""
    return (
        scored.groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.avg((F.col("prediction") == F.col(label_col)).cast("double")).alias("accuracy"),
            F.avg((F.col("prediction") == 1.0).cast("double")).alias("positive_rate"),
        )
        .orderBy("variant")
    )


def promote_challenger(
    spark: SparkSession,
    registry: ModelRegistry,
    model_name: str,
    variant_metrics: DataFrame,
    min_lift: float = 0.0,
    run_id: str = "run-0",
) -> dict:
    """Metric-gated promotion: if the challenger's observed accuracy
    beats the champion's by more than ``min_lift``, register a new
    champion version; otherwise record the challenger as rejected.
    Returns the decision record either way (deterministic given the
    metrics table). Raises a descriptive ``ValueError`` if either
    variant slice is empty (``challenger_pm`` of 0/1000, or an empty
    scored population) — a bare KeyError would be opaque for a function
    whose product is a decision record."""
    rows = {r["variant"]: r for r in variant_metrics.collect()}
    missing = [v for v in ("champion", "challenger") if v not in rows]
    if missing:
        raise ValueError(
            f"promotion for {model_name!r} needs metrics for both variants; "
            f"missing {missing} (empty variant slice - check challenger_pm "
            "and that the scored population is non-empty)"
        )
    champ, chall = rows["champion"], rows["challenger"]
    promoted = chall["accuracy"] > champ["accuracy"] + min_lift
    version = registry.register(
        spark,
        model_name,
        stage="champion" if promoted else "challenger_rejected",
        metric_name="ab_accuracy",
        metric_value=float(chall["accuracy"]),
        run_id=run_id,
    )
    return {
        "promoted": promoted,
        "version": version,
        "champion_accuracy": float(champ["accuracy"]),
        "challenger_accuracy": float(chall["accuracy"]),
    }
