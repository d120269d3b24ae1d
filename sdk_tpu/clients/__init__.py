"""Client SDK: high-level Bucket API over the PIR protocol
(mirrors the reference python SDK, python/blyss/)."""

from .bucket import Bucket
from .bucket_service import BucketService

__all__ = ["Bucket", "BucketService"]
