from .catalog import LakeCatalog
from .lake import LakeTable

__all__ = ["LakeTable", "LakeCatalog"]
