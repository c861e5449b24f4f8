"""L5 driver — the vloam_main_node equivalent (CLI instead of actionlib/rosbag)."""
