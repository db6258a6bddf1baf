from .t2map_pipeline import process_t2maps
from .recon_pipeline import process_qmri

__all__ = ["process_t2maps", "process_qmri"]
