from .materials import Material, MaterialTable  # noqa: F401
from .tables import SceneData, SceneBuilder  # noqa: F401
