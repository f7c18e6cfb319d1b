"""Distribution layer: host thread-parallel decode/encode of
independent streams (`host`), device-mesh sharded decode with on-device
checksums (`shard`), mesh construction (`mesh`), and multi-host member
balancing (`distributed`). Import submodules directly; `host` has no
jax dependency."""
