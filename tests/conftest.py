import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    # importing the package installs the pandas-block schema shim in
    # this process and (via closure unpickling) in every worker; a
    # worker_process_setup_hook would unpickle before worker sys.path
    # setup and break — see io.install_schema_metadata_shim
    import matomo_log_analytics_ray  # noqa: F401

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()
