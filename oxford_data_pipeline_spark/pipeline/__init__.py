from oxford_data_pipeline_spark.pipeline.session_pipeline import (
    PipelineConfig,
    run_session_pipeline,
)

__all__ = ["PipelineConfig", "run_session_pipeline"]
