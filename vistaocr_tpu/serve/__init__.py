from .service import OcrService, ServiceConfig

__all__ = ["OcrService", "ServiceConfig"]
