/*
 * LED light source controller for lensless-camera measurement rigs.
 *
 * Capability parity with the reference rig's LED controller
 * (reference: led_light_source/led_light_source.ino): a potentiometer
 * on an analog pin sets the brightness of a PWM-driven LED used to
 * illuminate measurement scenes, with the current level echoed over
 * serial for logging.
 *
 * This sketch is an original implementation with two additions useful
 * during automated captures (scripts/measure/*):
 *   - exponential smoothing of the pot reading, so mechanical jitter
 *     does not flicker the light source mid-exposure;
 *   - a serial override: send "b<0-255>\n" to pin the brightness from
 *     the host (e.g. the capture script), or "p\n" to return control
 *     to the potentiometer.
 */

const uint8_t POT_PIN = A0;     // potentiometer wiper
const uint8_t LED_PIN = 9;      // PWM-capable output driving the LED (via MOSFET for high-power LEDs)
const unsigned long BAUD = 9600;
const uint8_t SMOOTH_SHIFT = 3; // EMA weight 1/8

bool hostControl = false;       // true after a "b" command until "p"
int smoothed = 0;               // 10-bit smoothed pot value

void setup() {
  pinMode(LED_PIN, OUTPUT);
  Serial.begin(BAUD);
  smoothed = analogRead(POT_PIN);
}

void handleSerial() {
  while (Serial.available() > 0) {
    int c = Serial.read();
    if (c == 'p') {
      hostControl = false;
    } else if (c == 'b') {
      long level = Serial.parseInt();
      if (level < 0) level = 0;
      if (level > 255) level = 255;
      hostControl = true;
      analogWrite(LED_PIN, (uint8_t)level);
      Serial.println(level);
    }
  }
}

void loop() {
  handleSerial();
  if (!hostControl) {
    int raw = analogRead(POT_PIN);                       // 0..1023
    smoothed += (raw - smoothed) >> SMOOTH_SHIFT;        // EMA, integer-only
    uint8_t duty = (uint8_t)(smoothed >> 2);             // 10-bit -> 8-bit PWM
    analogWrite(LED_PIN, duty);
    Serial.println(duty);
  }
  delay(10);
}
