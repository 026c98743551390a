from . import cells, covering, region
from .covering import MAX_CELLS, covering as cover
from .region import Region

__all__ = ["cells", "covering", "region", "Region", "cover", "MAX_CELLS"]
