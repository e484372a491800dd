from vulkanhybridrenderer_tpu.models.base import RenderPath, get_path  # noqa: F401
