from .bids import get_img_path, mk_bids_dir
from .metadata import set_metadata, csv2df

__all__ = ["get_img_path", "mk_bids_dir", "set_metadata", "csv2df"]
