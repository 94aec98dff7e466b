"""Edit-record state machine: per-image JSON session records + withdraw
(reference ``Pipeline_utils/customization_util.py:20-106``).

Records for image N live at ``<results_base>/update_records/<N>_records.json``
as a list of ``{colorization_type, result_name, input_text, proc_bg_text}``;
result images at ``<results_base>/results/<N>/<N>_k.png``.  Withdraw deletes
the newest image and truncates the JSON (removing it entirely when only one
record remains).
"""
from __future__ import annotations

import json
import os
from typing import List, Tuple


def _records_path(results_base_dir: str, image_id) -> str:
    records_dir = os.path.join(results_base_dir, "update_records")
    os.makedirs(records_dir, exist_ok=True)
    return os.path.join(records_dir, f"{image_id}_records.json")


def fetch_records(image_id, results_base_dir: str) -> Tuple[str, str, str, List[dict]]:
    """Returns (new_result_image_name, last_result_image_name, last_bg_text, summary)."""
    records_file_path = _records_path(results_base_dir, image_id)

    summary_data: List[dict] = []
    last_bg_text = ""

    if not os.path.isfile(records_file_path):
        new_result_image_name = f"{image_id}_1.png"
        last_result_image_name = ""
    else:
        with open(records_file_path) as fp:
            record_json_data = json.load(fp)
        for rec in record_json_data:
            last_bg_text = rec["proc_bg_text"]
            summary_data.append({
                "colorization_type": rec["colorization_type"],
                "result_name": rec["result_name"],
                "input_text": rec["input_text"],
                "proc_bg_text": last_bg_text,
            })
        new_result_image_name = f"{image_id}_{len(record_json_data) + 1}.png"
        last_result_image_name = record_json_data[-1]["result_name"]

    return new_result_image_name, last_result_image_name, last_bg_text, summary_data


def update_records(image_id, input_text: str, results_base_dir: str,
                   colorization_type: str, new_result_image_name: str,
                   proc_bg_text: str, summary_data: List[dict]) -> None:
    records_file_path = _records_path(results_base_dir, image_id)
    summary_data = list(summary_data)
    summary_data.append({
        "colorization_type": colorization_type,
        "result_name": new_result_image_name,
        "input_text": input_text,
        "proc_bg_text": proc_bg_text,
    })
    with open(records_file_path, "w") as f:
        json.dump(summary_data, f, indent=4)


def withdraw_records(image_id, results_base_dir: str) -> None:
    results_dir = os.path.join(results_base_dir, "results", str(image_id))
    records_file_path = _records_path(results_base_dir, image_id)

    if not os.path.isfile(records_file_path):
        raise FileNotFoundError("No record to withdraw.")

    with open(records_file_path) as fp:
        record_json_data = json.load(fp)

    last_result_img_path = os.path.join(results_dir, f"{image_id}_{len(record_json_data)}.png")
    if os.path.isfile(last_result_img_path):
        os.remove(last_result_img_path)

    if len(record_json_data) == 1:
        os.remove(records_file_path)
    else:
        with open(records_file_path, "w") as f:
            json.dump(record_json_data[:-1], f, indent=4)
