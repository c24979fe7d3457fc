from vkr_tpu.scene.gltf import GltfScene, Material, Primitive, DrawCall, load_gltf
from vkr_tpu.scene.scene import CompiledScene, compile_scene, load_scene, build_mip_pyramid
from vkr_tpu.scene.camera import Camera
from vkr_tpu.scene.procedural import colonnade_scene, build_colonnade
