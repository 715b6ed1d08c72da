#!/bin/bash
# Fetch the evaluation datasets from their official hosts.
#
#   scripts/download_datasets.sh tum|euroc|7-scenes|eth3d [dest_root]
#
# Layouts match what frodo_slam_tpu/data/datasets.py dispatches on
# (datasets/tum/rgbd_dataset_freiburg1_room, datasets/euroc/MH_01_easy, ...).
# The reference documents the same sources (its scripts/download_*.sh);
# URLs are the datasets' official distribution endpoints.
set -euo pipefail

suite="${1:?usage: download_datasets.sh tum|euroc|7-scenes|eth3d [dest_root]}"
root="${2:-datasets}"

fetch() { # url dest_file
    if command -v wget >/dev/null; then wget -c "$1" -O "$2"; else curl -L -C - "$1" -o "$2"; fi
}

case "$suite" in
tum)
    dest="$root/tum"; mkdir -p "$dest"
    for seq in 360 floor desk desk2 room plant teddy xyz rpy; do
        f="rgbd_dataset_freiburg1_${seq}.tgz"
        fetch "https://cvg.cit.tum.de/rgbd/dataset/freiburg1/$f" "$dest/$f"
        tar -xzf "$dest/$f" -C "$dest" && rm "$dest/$f"
    done
    ;;
euroc)
    dest="$root/euroc"; mkdir -p "$dest"
    base="http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset"
    for s in "vicon_room1/V1_01_easy" "vicon_room1/V1_02_medium" \
             "vicon_room1/V1_03_difficult" "vicon_room2/V2_01_easy" \
             "vicon_room2/V2_02_medium" "vicon_room2/V2_03_difficult" \
             "machine_hall/MH_01_easy" "machine_hall/MH_02_easy" \
             "machine_hall/MH_03_medium" "machine_hall/MH_04_difficult" \
             "machine_hall/MH_05_difficult"; do
        name="$(basename "$s")"
        fetch "$base/$s/$name.zip" "$dest/$name.zip"
        unzip -oq "$dest/$name.zip" -d "$dest/$name" && rm "$dest/$name.zip"
    done
    ;;
7-scenes)
    dest="$root/7-scenes"; mkdir -p "$dest"
    base="http://download.microsoft.com/download/2/8/5/28564B23-0828-408F-8631-23B1EFF1DAC8"
    for scene in chess fire heads office pumpkin redkitchen stairs; do
        fetch "$base/$scene.zip" "$dest/$scene.zip"
        unzip -oq "$dest/$scene.zip" -d "$dest" && rm "$dest/$scene.zip"
        # each scene ships its sequences as nested zips
        for z in "$dest/$scene"/*.zip; do
            [ -e "$z" ] && unzip -oq "$z" -d "$dest/$scene" && rm "$z"
        done
    done
    ;;
eth3d)
    dest="$root/eth3d/train"; mkdir -p "$dest"
    # the 57 training sequences of the ETH3D SLAM benchmark (mono bundles),
    # the set scripts/eval_eth3d.sh evaluates
    seqs=(cables_1 cables_2 cables_3 camera_shake_1 camera_shake_2
          camera_shake_3 ceiling_1 ceiling_2 desk_3 desk_changing_1
          einstein_1 einstein_2 einstein_dark einstein_flashlight
          einstein_global_light_changes_1 einstein_global_light_changes_2
          einstein_global_light_changes_3 kidnap_1 kidnap_dark large_loop_1
          mannequin_1 mannequin_3 mannequin_4 mannequin_5 mannequin_7
          mannequin_face_1 mannequin_face_2 mannequin_face_3 mannequin_head
          motion_1 planar_2 planar_3 plant_1 plant_2 plant_3 plant_4 plant_5
          plant_dark plant_scene_1 plant_scene_2 plant_scene_3 reflective_1
          repetitive sfm_bench sfm_garden sfm_house_loop sfm_lab_room_1
          sfm_lab_room_2 sofa_1 sofa_2 sofa_3 sofa_4 sofa_dark_1 sofa_dark_2
          sofa_dark_3 sofa_shake table_3 table_4 table_7 vicon_light_1
          vicon_light_2)
    for seq in "${seqs[@]}"; do
        fetch "https://www.eth3d.net/data/slam/datasets/${seq}_mono.zip" \
              "$dest/${seq}_mono.zip"
        unzip -oq "$dest/${seq}_mono.zip" -d "$dest" && rm "$dest/${seq}_mono.zip"
    done
    ;;
*)
    echo "unknown suite: $suite" >&2; exit 1
    ;;
esac
echo "done: $suite -> $root"
