from .publishers import FramePublisher, MapPublisher

__all__ = ["FramePublisher", "MapPublisher"]
