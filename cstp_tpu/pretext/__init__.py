from cstp_tpu.pretext.sampling import (  # noqa: F401
    PACE,
    OVERLAP_TEM_RATE,
    OVERLAP_SPA_RATE,
    ROTATE_DEG,
    sample_playback_label,
    wraparound_frame_indices,
    strided_frame_indices,
    valid_temporal_offsets,
    sample_temporal_overlap,
    sample_clip_pair_host,
    ClipPairSample,
)
