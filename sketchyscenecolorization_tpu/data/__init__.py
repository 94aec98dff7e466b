from .records import fetch_records, update_records, withdraw_records
from .fixtures import (
    load_sketch_image,
    load_inner_mask,
    load_color_map,
    load_seg_data,
    expand_small_segmentation_mask,
    compute_mask_iou,
    compute_mask_occupied_percentage,
    get_pred_instance_mask,
)
