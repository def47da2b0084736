from . import pipelines, thumbnailer

__all__ = ["pipelines", "thumbnailer"]
