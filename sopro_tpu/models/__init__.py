from sopro_tpu.models.sopro import (  # noqa: F401
    ARCarry,
    ARSettings,
    PreparedReference,
    SoproModelParams,
    ar_generate,
    ar_generate_chunk,
    default_ar_settings,
    init_sopro_model,
    nar_refine,
    prepare_conditioning,
    prepare_reference,
)
