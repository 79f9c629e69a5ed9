from sparkroach.sources.block_sink import (  # noqa: F401
    BlockFileSinkDataSource,
    blocks_to_dir,
    register_block_sink,
)
from sparkroach.sources.block_source import (  # noqa: F401
    BlockDirDataSource,
    blocks_from_dir,
    register_block_source,
    write_block_file,
)
from sparkroach.sources.avro_ocf import (  # noqa: F401
    AvroDataSource,
    register_avro_source,
)
from sparkroach.sources.binfiles import (  # noqa: F401
    BinFilesDataSource,
    register_binfiles_sink,
)
