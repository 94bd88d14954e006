from kamae_ray.pipelines.pipeline import Pipeline, PipelineModel  # noqa: F401
