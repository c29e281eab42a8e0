// LED light source for measurement setups (counterpart of the
// reference's led_light_source.ino): drives a PWM LED whose
// brightness tracks a potentiometer, with two additions useful when
// collecting datasets:
//  * exponential smoothing of the pot reading (stable illumination
//    during long captures), and
//  * a serial override ("0".."255\n" sets brightness, "p\n" returns
//    to pot control) so the capture scripts can program the light
//    level remotely over USB.

const int POT_PIN = A0;
const int LED_PIN = 9;          // hardware PWM
const float SMOOTH = 0.9;       // EMA factor for the pot reading

float level = 0.0;
bool serial_override = false;
int serial_level = 0;

void setup() {
  pinMode(LED_PIN, OUTPUT);
  Serial.begin(9600);
}

void loop() {
  while (Serial.available() > 0) {
    String cmd = Serial.readStringUntil('\n');
    cmd.trim();
    if (cmd == "p") {
      serial_override = false;
    } else if (cmd.length() > 0) {
      serial_level = constrain(cmd.toInt(), 0, 255);
      serial_override = true;
    }
  }

  if (serial_override) {
    analogWrite(LED_PIN, serial_level);
    Serial.println(serial_level);
  } else {
    // 10-bit ADC -> 8-bit PWM, smoothed
    level = SMOOTH * level + (1.0 - SMOOTH) * (analogRead(POT_PIN) / 4);
    int out = (int)(level + 0.5);
    analogWrite(LED_PIN, out);
    Serial.println(out);
  }
  delay(10);
}
