package graft.train

import graft.TestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.io.File

/** TrainRegressor quality goldens across the learner zoo, mirroring the
  * reference's VerifyTrainRegressor rows the same way BenchmarksSuite
  * mirrors VerifyTrainClassifier: every RMSE/R2 is compared against a
  * committed CSV at a per-row precision; regressions fail the suite.
  * Regenerate with GRAFT_REGEN_BENCHMARKS=1 after an intentional change.
  */
class RegressorBenchmarksSuite extends TestBase with Benchmarks {

  override def goldenFile: File =
    new File("src/test/resources/benchmarks/benchmarks_TrainRegressor.csv")

  /** Deterministic regression fixture: target is a fixed mixed-signal
    * function of the event columns (linear in value, categorical steps
    * from user/event id residues) so every learner family has signal. */
  private def fixture: DataFrame = {
    val ev = sfTable("events")
    ev.select(col("event_id"), col("value"), col("user_id"), col("event_type"),
      (col("value") * 2.0 + (col("user_id") % 7) * 25.0
        + when(col("event_type") === "purchase", 60.0).otherwise(0.0)
        + (col("event_id") % 11) * 9.0).as("target"))
  }

  test("TrainRegressor RMSE/R2 match committed goldens per learner") {
    val df = fixture.cache()
    for (learner <- Seq("LinearRegression", "RandomForest", "GBT", "DecisionTree")) {
      val model = new TrainRegressor().setLabelCol("target")
        .setFeatureCols(Seq("value", "user_id", "event_type"))
        .setLearner(learner).fit(df)
      val scored = model.transform(df)
      val metrics = new ComputeModelStatistics().setLabelCol("target")
        .setEvaluationMetric("regression").transform(scored).head
      // RMSE scale tracks the target range (~0-400); gate at ±1.0
      addBenchmark(s"${learner}_events_RMSE",
        metrics.getAs[Double]("rmse"), precision = 1.0)
      addBenchmark(s"${learner}_events_R2", metrics.getAs[Double]("r2"))
    }
    verifyBenchmarks()
  }
}
