from .ota import OTAConfig, ota_assign, ota_assign_batch
from .hungarian import auction_assign, hungarian_assign

__all__ = ["OTAConfig", "ota_assign", "ota_assign_batch",
           "hungarian_assign", "auction_assign"]
